package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column, built on the
  * single-pass mergeable [[graft.functions.Aggregators.GramMatrix]]
  * reduction — the corpus-scale route to whitening, dimensionality
  * reduction, and drift diagnostics:
  *
  *  1. ONE distributed pass computes every second-order moment at once
  *     via the augmented-vector trick: x' = [scaled(x), S] (S = the
  *     integer scale). Σ x'x'ᵀ then contains the Gram block (Σ xxᵀ,
  *     scaled S²), the per-dim sums (cross terms with the constant,
  *     scaled S²), and the row count (corner, S²) — so mean vector AND
  *     covariance fall out of a single (dim+1)² long array whose shuffle
  *     cost is constant in the corpus size.
  *  2. The (dim×dim) covariance eigenproblem is DRIVER-side: dim is
  *     model-sized (64 here), so cyclic Jacobi on a 64×64 symmetric
  *     matrix is microseconds — distributing it would be planning theater.
  *  3. Projection back over the corpus is a broadcast-free literal
  *     expression: each output component is a fixed-order fold
  *     Σᵢ (vᵢ − μᵢ)·wᵢⱼ of codegen'd column arithmetic (the rp1
  *     discipline), deterministic across partitionings and runs.
  *
  * Exactness: the distributed pass sums exact scaled integers (the
  * ev1/ec1 discipline), so `fit` is bit-reproducible for a given dataset
  * regardless of partitioning; Jacobi then runs in driver doubles.
  */
object Pca {

  /** Fitted model: `mean(i)`, orthonormal `components(j)(i)` (row j = the
    * j-th principal axis, descending eigenvalue), `eigenvalues(j)` =
    * population variance along axis j. */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  private val Scale = 1e6

  /** One distributed pass + driver-side Jacobi. `col` must be an
    * array&lt;float|double&gt; column of constant length `dim`. */
  def fit(df: DataFrame, colName: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim)
    val d1 = dim + 1
    val sv = transform(col(colName),
      v => round(v.cast("double") * Scale, 0).cast("long"))
    val aug = concat(sv, array(lit(Scale.toLong)))
    val gm = udaf(new graft.functions.Aggregators.GramMatrix(d1))
    val g = df.select(aug.as("sv")).agg(gm(col("sv"))).head.getSeq[Long](0)

    val n = g(dim * d1 + dim).toDouble / (Scale * Scale)
    require(n > 0, "PCA fit on an empty dataset")
    val mean = Array.tabulate(dim)(i => g(i * d1 + dim) / (Scale * Scale) / n)
    // C = E[xxᵀ] − μμᵀ (population covariance; symmetric fill from the
    // upper triangle the aggregator populated)
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val v = g(i * d1 + j) / (Scale * Scale) / n - mean(i) * mean(j)
      c(i)(j) = v; c(j)(i) = v
    }
    val (evals, evecs) = jacobi(c)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    Model(mean,
      order.map(j => Array.tabulate(dim)(i => evecs(i)(j))).toArray,
      order.map(evals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, eigenvectors-as-columns). O(dim³) per sweep, a handful
    * of sweeps to 1e-12 off-diagonal mass; dim is model-sized so this is
    * driver-cheap by construction. */
  private[similarity] def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += a(i)(j) * a(i)(j)
      s
    }
    while (off() > 1e-24 && sweep < 64) {
      for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-18) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
          case x if x == 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case x => x
        }
        val cth = 1.0 / math.sqrt(t * t + 1.0)
        val sth = t * cth
        for (i <- 0 until n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cth * aip - sth * aiq
          a(i)(q) = sth * aip + cth * aiq
        }
        for (i <- 0 until n) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cth * api - sth * aqi
          a(q)(i) = sth * api + cth * aqi
        }
        for (i <- 0 until n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cth * vip - sth * viq
          v(i)(q) = sth * vip + cth * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Projection columns pc0..pc(k−1): each is a FIXED-ORDER left-assoc
    * fold Σᵢ (vᵢ − μᵢ)·wᵢⱼ over literal model weights — plain codegen'd
    * arithmetic, no UDF, deterministic under any partitioning. */
  def projection(colName: String, model: Model): Seq[Column] =
    (0 until model.k).map { j =>
      (0 until model.dim).map { i =>
        (element_at(col(colName), i + 1).cast("double") - lit(model.mean(i))) *
          lit(model.components(j)(i))
      }.reduce(_ + _).as(s"pc$j")
    }

  /** df with the k projected component columns appended. */
  def transformDf(df: DataFrame, colName: String, model: Model): DataFrame =
    df.select((df.columns.map(col) ++ projection(colName, model)): _*)
}
