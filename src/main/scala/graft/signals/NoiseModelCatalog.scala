package graft.signals

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import graft.config.OptionDsl

/** Noise-model catalog (SURVEY U3: the `StandardModels` plugin surface,
  * enterprise_models.py + examples/custom_models.py).
  *
  * A signal entry couples:
  *  - a PRIOR list (names + ranges) that extends the paramfile registry
  *    (enterprise_warp.py:149),
  *  - a SELECTION: which flag partitions the data (by-backend EFAC etc. —
  *    F5: a selection is a partition key, not N boolean masks),
  *  - a BASIS sizing rule (Fourier nfreqs from the option DSL).
  *
  * Dispatch by signal name (`getattr(model_obj, signal)(option=…)`,
  * enterprise_warp.py:515-537) is a Map lookup; custom catalogs register by
  * class-name reflection like the reference's importlib loading.
  */
object NoiseModelCatalog {

  case class Prior(name: String, lo: Double, hi: Double, typ: String = "float") {
    /** F12: scalar negative prior marks the parameter constant-folded from
      * noise files (checkifconstpar, enterprise_warp.py:561-581). */
    def isConst: Boolean = lo < 0 && lo == hi
  }

  case class SignalSpec(
      signal: String,
      option: String,
      priors: Seq[Prior],
      selectionFlag: Option[String], // None = whole-pulsar
      nFreqs: Option[Int])

  /** One signal builder: option string → spec. */
  type Builder = String => SignalSpec

  trait Catalog {
    def builders: Map[String, Builder]
    /** label→type pairs for ParamFile.extendRegistry (get_label_attr_map). */
    def labelRegistry: Iterable[(String, String)] =
      builders.keys.map(_ -> "str")
    def build(signal: String, option: String): SignalSpec =
      builders.getOrElse(signal,
        throw new IllegalArgumentException(s"unknown signal: $signal"))(option)
  }

  /** The standard catalog: white noise (by-backend), red/DM/chromatic noise
    * (Fourier GP), system/band noise (flag-selected), GWB. Priors follow the
    * reference's defaults (enterprise_models.py:97-108 prior dict shape). */
  object Standard extends Catalog {
    private def freqs(option: String): Option[Int] =
      OptionDsl.parseFreqOption(option).nFreqs

    val builders: Map[String, Builder] = Map(
      "efac" -> (o => SignalSpec("efac", o,
        Seq(Prior("efac", 0.0, 10.0)), Some("f"), None)),
      "equad" -> (o => SignalSpec("equad", o,
        Seq(Prior("equad", -10.0, -5.0)), Some("f"), None)),
      "ecorr" -> (o => SignalSpec("ecorr", o,
        Seq(Prior("ecorr", -10.0, -5.0)), Some("f"), None)),
      "spin_noise" -> (o => SignalSpec("spin_noise", o,
        Seq(Prior("red_noise_log10_A", -20.0, -10.0),
          Prior("red_noise_gamma", 0.0, 10.0)), None, freqs(o))),
      "dm_noise" -> (o => SignalSpec("dm_noise", o,
        Seq(Prior("dm_gp_log10_A", -20.0, -10.0),
          Prior("dm_gp_gamma", 0.0, 10.0)), None, freqs(o))),
      "chrom_noise" -> (o => SignalSpec("chrom_noise", o,
        Seq(Prior("chrom_gp_log10_A", -20.0, -10.0),
          Prior("chrom_gp_gamma", 0.0, 10.0)), None, freqs(o))),
      "system_noise" -> (o => SignalSpec("system_noise", o,
        Seq(Prior("system_noise_log10_A", -20.0, -10.0),
          Prior("system_noise_gamma", 0.0, 10.0)), Some("group"), freqs(o))),
      "band_noise" -> (o => SignalSpec("band_noise", o,
        Seq(Prior("band_noise_log10_A", -20.0, -10.0),
          Prior("band_noise_gamma", 0.0, 10.0)), Some("B"), freqs(o))),
      "gwb" -> (o => SignalSpec("gwb", o,
        Seq(Prior("gw_log10_A", -18.0, -12.0), Prior("gw_gamma", 0.0, 10.0)),
        None, freqs(o))),
    )
  }

  /** F4/F5: selection spec → partitioning Column (the whole CPython
    * code-object machinery of enterprise_models.py:616-683 reduced to a
    * parameterized expression). */
  def selectionColumn(spec: SignalSpec): Option[Column] =
    spec.selectionFlag.map(f => col("flags").getItem(f))

  /** U3: load a custom catalog by fully-qualified object name (the
    * reference's importlib path, results.py:1100-1106). */
  def loadCatalog(className: String): Catalog = {
    val clazz = Class.forName(className + "$")
    clazz.getField("MODULE$").get(null).asInstanceOf[Catalog]
  }

  /** Merge: custom catalogs override/extend standard builders (subclass
    * semantics of examples/custom_models.py:11-47). */
  def merged(base: Catalog, extra: Catalog): Catalog = new Catalog {
    val builders: Map[String, Builder] = base.builders ++ extra.builders
  }
}
