package graft.config

/** The reference's option-string mini-DSL (SURVEY X8) — a config-side
  * parser, NOT a UDF.
  *
  * Grammar observed in the reference:
  *  - `option_nfreqs` (enterprise_models.py:170-199): underscore-separated
  *    tokens; `<n>_nfreqs` pins the Fourier component count, `<n>_ndays`
  *    sets the cadence the count is derived from; the remainder re-joins to
  *    the model name; a purely numeric remainder casts to a number.
  *  - gwb options (enterprise_models.py:386-457): `+`-separated terms, each
  *    dispatching on suffix: `_gamma` (fixed spectral index), `freesp`
  *    (free spectrum), `hd` / `mono` / `dipo` (ORF choice), `turnover`.
  */
object OptionDsl {

  case class FreqSpec(model: String, nFreqs: Option[Int], nDays: Option[Double],
      numeric: Option[Double])

  private val NfreqsRe = """(\d+)_nfreqs""".r
  private val NdaysRe = """(\d+(?:\.\d+)?)_ndays""".r

  /** Parse `[<n>_nfreqs_][<d>_ndays_]<model>` in any token order. */
  def parseFreqOption(opt: String): FreqSpec = {
    val toks = opt.split("_").toSeq
    var nf: Option[Int] = None
    var nd: Option[Double] = None
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i + 1) == "nfreqs" && toks(i).forall(_.isDigit)) {
        nf = Some(toks(i).toInt); i += 2
      } else if (i + 1 < toks.length && toks(i + 1) == "ndays" &&
          toks(i).matches("""\d+(\.\d+)?""")) {
        nd = Some(toks(i).toDouble); i += 2
      } else { rest += toks(i); i += 1 }
    }
    val model = rest.mkString("_")
    FreqSpec(model, nf, nd, model.toDoubleOption)
  }

  sealed trait GwbTerm
  case class PowerlawGwb(fixedGamma: Option[Double]) extends GwbTerm
  case object FreeSpectrum extends GwbTerm
  case class OrfGwb(orf: String, base: GwbTerm) extends GwbTerm
  case object TurnoverGwb extends GwbTerm

  private val GammaRe = """.*gamma_(\d+(?:\.\d+)?).*""".r

  /** Parse a `+`-separated gwb option into its terms. */
  def parseGwbOption(opt: String): Seq[GwbTerm] =
    opt.split("\\+").toSeq.map(parseGwbTerm)

  def parseGwbTerm(term: String): GwbTerm = {
    val orf = Seq("hd", "mono", "dipo").find(o =>
      term == o || term.startsWith(s"${o}_") || term.endsWith(s"_$o"))
    val stripped = orf.fold(term)(o =>
      term.stripPrefix(s"${o}_").stripSuffix(s"_$o") match {
        case `term` if term == o => ""
        case s => s
      })
    val base: GwbTerm = stripped match {
      case "" => PowerlawGwb(None)
      case "freesp" => FreeSpectrum
      case "turnover" => TurnoverGwb
      case GammaRe(g) => PowerlawGwb(Some(g.toDouble))
      case s if s.contains("gamma") => PowerlawGwb(Some(13.0 / 3)) // vargam default
      case _ => PowerlawGwb(None)
    }
    orf.fold(base)(o => OrfGwb(o, base))
  }
}
