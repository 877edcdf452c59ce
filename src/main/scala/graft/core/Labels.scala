package graft.core

/** String/label utilities (SURVEY X9-X14) — the reference's path/label
  * plumbing as plain functions (driver-side config strings) plus Column
  * variants where they act on data.
  */
object Labels {

  /** X10: label sanitization (enterprise_warp.py:154-158) — strip single
    * quotes, brackets, braces, colons; spaces become underscores. */
  def sanitize(label: String): String =
    label.replaceAll("""['\[\]{}:]""", "").replace(' ', '_')

  /** X11: output-path composition (enterprise_warp.py:402-405,461-465):
    * out/model-labels/num_psr/. */
  def outputPath(out: String, labels: Seq[String], num: Option[Int],
      psr: String): String = {
    val base = out.stripSuffix("/")
    val lbl = labels.map(sanitize).mkString("_")
    val idx = num.map(n => s"${n}_").getOrElse("")
    s"$base/$lbl/$idx$psr/"
  }

  /** X13: digit / float-castable predicates. */
  def isAllDigits(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)
  def isFloatCastable(s: String): Boolean = s.toDoubleOption.isDefined

  /** X14: LaTeX label wrapping for plot layers (results.py:641-642,671). */
  def latexLabel(par: String): String = "$" + par.replace("_", "\n") + "$"

  /** X9 as a Column: pulsar name from a file path
    * (`p.split('/')[-1].split('_')[0].split('.')[0]`). */
  def psrFromPath(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    element_at(split(element_at(split(element_at(split(path, "/"), -1), "_"), 1), "\\."), 1)
  }
}
