package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Noise-simulation support (SURVEY ew.sim; libstempo_warp.py:53-237).
  *
  * The reference injects EFAC/EQUAD/red/DM noise into idealized TOAs for
  * parameter-recovery testing. The injection RNG stays external (seeded,
  * SURVEY §7.4.5); this layer provides the deterministic parts: the noise
  * parameter → injection-vector assembly and backend bookkeeping.
  */
object Injection {

  /** X16: `added_noise_psd_to_vector` (libstempo_warp.py:227-237) — a noise
    * param map filtered by kind, ordered by backend, emitted as a vector. */
  def psdToVector(params: Map[String, Double], kind: String,
      backends: Seq[String]): Seq[Double] =
    backends.flatMap { b =>
      // deterministic pick: lexicographically smallest matching param name
      params.filter { case (name, _) =>
        name.contains(b) && name.toLowerCase.contains(kind)
      }.toSeq.sortBy(_._1).headOption.map(_._2)
    }

  /** A14/E3: distinct backends across flag conventions — union of the
    * values of every flag the conventions use (libstempo_warp.py:61-72). */
  def distinctBackends(toas: DataFrame, flagPriority: Seq[String] = Seq("f", "g", "sys", "group")): Seq[String] = {
    val c = flagPriority.map(f => col("flags").getItem(f))
    toas.select(coalesce(c: _*).as("backend"))
      .filter(col("backend").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
  }

  /** A18: used-vs-available backend reconciliation
    * (libstempo_warp.py:218-223) — returns (used, unused). */
  def reconcileBackends(available: Seq[String], noiseParams: Iterable[String])
      : (Seq[String], Seq[String]) = {
    val used = available.filter(b => noiseParams.exists(_.contains(b)))
    (used, available.diff(used))
  }

  /** J9: backend ↔ noise-param containment join (libstempo_warp.py:84-98)
    * as a DataFrame theta join. */
  def backendParamJoin(noise: DataFrame, backends: DataFrame): DataFrame =
    noise.join(backends, col("param").contains(col("backend")))
}
