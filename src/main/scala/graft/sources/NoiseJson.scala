package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Noise-model specs and noise files (SURVEY §1.4, §2.1 S5/S6, §2.4 J2-J4).
  *
  * Noise-model JSON shape (reference
  * `examples/example_noisemodels/system_noise_example.json:1-19`):
  * `{model_name, universal:{signal→option}, common_signals:{...},
  * "<PSR>":{...}}`; options are string | number | list | dict. Long form
  * here: (psr, signal, option) with option JSON-encoded — `universal` and
  * `common_signals` kept as pseudo-pulsars.
  *
  * Noise files: flat `{"<PSR>_<backend>_<param>": double}` (PAL2 format,
  * `examples/example_noisefiles/J1832-0836_noise.json:1-14`).
  */
object NoiseJson {

  /** S5: one noise-model JSON → long (psr, signal, option_json). json4s is
    * Spark's own bundled JSON AST — driver-side parse, config-sized data. */
  def readModelSpec(path: String): Seq[(String, String, String)] = {
    val json = JsonMethods.parse(new java.io.File(path))
    json match {
      case JObject(fields) =>
        fields.flatMap {
          case ("model_name", _) => Seq.empty
          case (psr, JObject(signals)) =>
            signals.map { case (sig, v) =>
              (psr, sig, JsonMethods.compact(JsonMethods.render(v)))
            }
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
  }

  def modelSpecDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readModelSpec(path).toDF("psr", "signal", "option")
  }

  /** J2: per-pulsar signal resolution with `universal` fallback
    * (enterprise_warp.py:527-530): left join + coalesce. */
  def resolveSignals(psrs: DataFrame, spec: DataFrame): DataFrame = {
    val perPsr = spec.filter(!col("psr").isin("universal", "common_signals"))
      .withColumnRenamed("option", "psr_option")
    val universal = spec.filter(col("psr") === "universal")
      .select(col("signal"), col("option").as("universal_option"))
    val signals = universal.select(col("signal")).union(
      perPsr.select(col("signal"))).distinct()
    psrs.crossJoin(broadcast(signals))
      .join(broadcast(perPsr), Seq("psr", "signal"), "left")
      .join(broadcast(universal), Seq("signal"), "left")
      .withColumn("option", coalesce(col("psr_option"), col("universal_option")))
      .filter(col("option").isNotNull)
      .select(col("psr"), col("signal"), col("option"))
  }

  /** J4: `merge_two_noise_model_dicts` (enterprise_warp.py:631-646) —
    * per-(psr, signal) upsert; list options union, scalars overridden by
    * the extra dict. */
  def mergeSpecs(base: DataFrame, extra: DataFrame): DataFrame = {
    val b = base.withColumnRenamed("option", "base_opt")
    val e = extra.withColumnRenamed("option", "extra_opt")
    b.join(e, Seq("psr", "signal"), "full_outer")
      .withColumn("option",
        when(col("base_opt").isNull, col("extra_opt"))
          .when(col("extra_opt").isNull, col("base_opt"))
          .when(col("base_opt").startsWith("[") && col("extra_opt").startsWith("["),
            // list-set-union, order-stable: base order then unseen extras
            to_json(array_union(
              from_json(col("base_opt"), ArrayType(StringType)),
              from_json(col("extra_opt"), ArrayType(StringType)))))
          .otherwise(col("extra_opt")))
      .select(col("psr"), col("signal"), col("option"))
  }

  /** S6: glob a directory of noise-file JSONs, keep files whose NAME
    * contains any wanted pulsar, union all params (get_noise_dict,
    * enterprise_warp.py:583-597). Duplicate params: last write wins in the
    * reference's dict.update loop — here, deterministic max-filename wins.
    */
  def readNoiseFiles(spark: SparkSession, dir: String, psrs: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".json") && psrs.exists(f.getName.contains))
      .sortBy(_.getName)
    val rows = files.flatMap { f =>
      JsonMethods.parse(f) match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => (k, v, f.getName)
          case (k, JInt(v)) => (k, v.toDouble, f.getName)
        }
        case _ => Seq.empty
      }
    }.toSeq
    val df = rows.toDF("param", "value", "src")
    // last-write-wins dedup as a window (SURVEY S6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("param")).orderBy(col("src").desc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("param"), col("value"))
  }

  /** J3: pin sampled parameters to constants from the noise files —
    * broadcast join on param name (enterprise_warp.py:544-548); params
    * with a noise-file value become constants, the rest stay sampled. */
  def constantsJoin(params: DataFrame, noise: DataFrame): DataFrame =
    params.join(broadcast(noise.withColumnRenamed("value", "const_value")),
      Seq("param"), "left")
      .withColumn("is_const", col("const_value").isNotNull)

  /** F13-lite: classify noise params by name → (psr, backend, kind)
    * (libstempo_warp.py:100-196 substring cascade). */
  def classifyParams(noise: DataFrame): DataFrame =
    noise.withColumn("kind",
      when(lower(col("param")).contains("efac"), "efac")
        .when(lower(col("param")).contains("equad"), "equad")
        .when(lower(col("param")).contains("ecorr"), "ecorr")
        .when(lower(col("param")).contains("dm_gp") || lower(col("param")).contains("dm_noise"), "dm")
        .when(lower(col("param")).contains("red_noise"), "red")
        .otherwise("other"))
      .withColumn("psr", split(col("param"), "_").getItem(0))
}
