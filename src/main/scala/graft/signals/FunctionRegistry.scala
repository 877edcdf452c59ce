package graft.signals

import org.apache.spark.sql.Column
import graft.functions.Psd

/** U1/U2: the reference's `@signal_base.function` / `@parameter_function`
  * registration surface (enterprise_models.py:593-612,
  * examples/custom_models.py:50-53) — a name→column-function registry.
  * Custom kernels register by name; pure column expressions, zero UDFs.
  */
object FunctionRegistry {

  type ColFn = Seq[Column] => Column

  val standardSpectra: Map[String, ColFn] = Map(
    "powerlaw" -> { case Seq(f, lgA, gamma) => Psd.powerlaw(f, lgA, gamma) },
    "powerlaw_bpl" -> { case Seq(f, lgA, gamma, fc) => Psd.powerlawBroken(f, lgA, gamma, fc) },
    "lorentzian" -> { case Seq(f, p0, fc, alpha) => Psd.lorentzian(f, p0, fc, alpha) },
  )

  val standardOrfs: Map[String, ColFn] = Map(
    "hd" -> { case Seq(cosZeta) => Psd.hellingsDowns(cosZeta) },
    "hd_noauto" -> { case Seq(cosZeta) => Psd.hellingsDownsNoAuto(cosZeta) },
    "dipole" -> { case Seq(cosZeta) => Psd.dipole(cosZeta) },
    "monopole" -> { case Seq(cosZeta) => Psd.monopole(cosZeta) },
  )

  case class Registry(fns: Map[String, ColFn]) {
    def register(name: String, fn: ColFn): Registry = Registry(fns + (name -> fn))
    def apply(name: String, args: Column*): Column =
      fns.getOrElse(name,
        throw new IllegalArgumentException(s"unknown function: $name"))(args)
  }

  val standard: Registry = Registry(standardSpectra ++ standardOrfs)
}
