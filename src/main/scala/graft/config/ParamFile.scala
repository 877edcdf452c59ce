package graft.config

/** Run-parameter (.dat) file parser (SURVEY §1.3).
  *
  * Format (enterprise_warp.py:162-203): `label: value [value …]` lines,
  * `#` comments, `{N}` headers opening per-model scopes. The label schema
  * is a typed, runtime-extensible registry (`label_attr_map`,
  * enterprise_warp.py:121-149): base labels + labels contributed by the
  * chosen noise-model catalog and sampler descriptor. Multi-value lines
  * become lists (enterprise_warp.py:180-184); defaults are injected after
  * parsing (set_default_params, :251-304); CLI overrides mutate per-model
  * values and the output label (override_params_using_opts, :217-231).
  */
object ParamFile {

  sealed trait PValue
  case class PStr(v: String) extends PValue
  case class PInt(v: Long) extends PValue
  case class PDbl(v: Double) extends PValue
  case class PList(v: Seq[PValue]) extends PValue

  /** A label's target attribute + preferred scalar type ("int" | "float" |
    * "str"). Mirrors label_attr_map entries. */
  case class ParamSpec(attr: String, typ: String)

  val baseRegistry: Map[String, ParamSpec] = Map(
    "datadir" -> ParamSpec("datadir", "str"),
    "out" -> ParamSpec("out", "str"),
    "overwrite" -> ParamSpec("overwrite", "str"),
    "array_analysis" -> ParamSpec("array_analysis", "str"),
    "timing_package" -> ParamSpec("timing_package", "str"),
    "psrlist" -> ParamSpec("psrlist", "str"),
    "ssephem" -> ParamSpec("ssephem", "str"),
    "clock" -> ParamSpec("clock", "str"),
    "sampler" -> ParamSpec("sampler", "str"),
    "nsamp" -> ParamSpec("nsamp", "int"),
    "mcmc_covm_csv" -> ParamSpec("mcmc_covm_csv", "str"),
    "model" -> ParamSpec("model", "str"),
    "noisefiles" -> ParamSpec("noisefiles", "str"),
    "noise_model_file" -> ParamSpec("noise_model_file", "str"),
  )

  val defaults: Map[String, PValue] = Map(
    "overwrite" -> PStr("0"),
    "sampler" -> PStr("ptmcmcsampler"),
    "nsamp" -> PInt(1000000L), // reference default runs (hypermodel.dat:10)
  )

  case class Parsed(
      common: Map[String, PValue],
      models: Map[Int, Map[String, PValue]])

  private val SectionRe = """\{(\d+)\}""".r

  private def typed(tok: String, spec: Option[ParamSpec]): PValue = {
    def asInt = tok.toLongOption.map(PInt)
    def asDbl = tok.toDoubleOption.map(PDbl)
    spec.map(_.typ) match {
      case Some("int") => asInt.orElse(asDbl).getOrElse(PStr(tok))
      case Some("float") => asDbl.getOrElse(PStr(tok))
      case Some("str") => PStr(tok)
      case _ => asInt.orElse(asDbl).getOrElse(PStr(tok)) // infer
    }
  }

  /** Parse lines with a (possibly extended) registry. Unknown labels in
    * strict mode raise — the reference's KeyError behavior. */
  def parse(lines: Seq[String], registry: Map[String, ParamSpec] = baseRegistry,
      strict: Boolean = false): Parsed = {
    var current: Option[Int] = None
    var common = Map.empty[String, PValue]
    var models = Map.empty[Int, Map[String, PValue]]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case SectionRe(n) =>
        current = Some(n.toInt)
        models += (n.toInt -> models.getOrElse(n.toInt, Map.empty))
      case line if line.contains(":") =>
        val Array(label, restRaw) = line.split(":", 2)
        val l = label.trim
        val spec = registry.get(l)
        if (strict && spec.isEmpty)
          throw new IllegalArgumentException(s"unknown parameter label: $l")
        val toks = restRaw.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val v: PValue =
          if (toks.length == 1) typed(toks.head, spec)
          else PList(toks.map(typed(_, spec)))
        current match {
          case Some(m) => models += (m -> (models(m) + (l -> v)))
          case None => common += (l -> v)
        }
      case _ => () // bare token lines ignored, like the reference
    }
    Parsed(common, models)
  }

  /** Inject defaults for missing labels (set_default_params). */
  def withDefaults(p: Parsed, defs: Map[String, PValue] = defaults): Parsed =
    p.copy(common = defs ++ p.common)

  /** CLI override: replace a label in every model scope and in common
    * (override_params_using_opts). */
  def overrideParam(p: Parsed, label: String, value: PValue): Parsed =
    Parsed(
      p.common + (label -> value),
      p.models.map { case (k, m) => k -> (m + (label -> value)) })

  /** Registry extension from a noise-model catalog's prior names + a
    * sampler's kwargs (enterprise_warp.py:149,186-197). */
  def extendRegistry(base: Map[String, ParamSpec],
      extra: Iterable[(String, String)]): Map[String, ParamSpec] =
    base ++ extra.map { case (name, typ) => name -> ParamSpec(name, typ) }
}
