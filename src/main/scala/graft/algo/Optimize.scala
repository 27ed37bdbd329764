package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `algo.or.solve` (reference `operator.rs:6617-6760` over
  * `crates/samyama-optimization/` — ~30 population metaheuristics on a
  * continuous per-node allocation problem): minimize Σ cᵢ·xᵢ with
  * xᵢ ∈ [lower, upper] per node carrying the cost property, under soft
  * constraints Σ xᵢ ≥ minTotal and Σ cᵢ·xᵢ ≤ budget.
  *
  * Spark-first: population metaheuristics are embarrassingly parallel at the
  * RESTART level — `starts` independent seeded solver instances run as
  * partition tasks (`spark.range(starts)` + mapPartitions), the cost vector
  * broadcasts once, and the best run wins deterministically (fitness, then
  * seed). The per-run solve is local, exactly like the reference's —
  * bounded by the label's cardinality, the same in-memory commitment it
  * makes collecting node costs.
  *
  * Three representative kernels (the reference's default + two families):
  * Jaya (move toward best / away from worst, parameter-free), SA (gaussian
  * perturbation + geometric cooling), TLBO (teacher + learner phases).
  */
object Optimize {

  final case class SolveResult(algorithm: String, fitness: Double,
                               iterations: Int, solution: Array[Double])

  private final class Objective(costs: Array[Double], lower: Double, upper: Double,
                                minTotal: Double, budget: Double) extends Serializable {
    val dim: Int = costs.length
    private val P = 1e9
    def apply(x: Array[Double]): Double = {
      var cost = 0.0; var tot = 0.0; var i = 0
      while (i < dim) { cost += costs(i) * x(i); tot += x(i); i += 1 }
      var f = cost
      if (tot < minTotal) f += P * (minTotal - tot)
      if (!budget.isNaN && cost > budget) f += P * (cost - budget)
      f
    }
    def clamp(v: Double): Double = math.max(lower, math.min(upper, v))
  }

  private def solveOne(obj: Objective, algorithm: String, popSize: Int,
                       maxIter: Int, lower: Double, upper: Double,
                       seed: Long): (Double, Array[Double]) = {
    val rnd = new scala.util.Random(seed)
    def randX(): Array[Double] =
      Array.fill(obj.dim)(lower + rnd.nextDouble() * (upper - lower))

    algorithm.toLowerCase match {
      case "sa" =>
        var x = randX(); var fx = obj(x)
        var best = x.clone(); var fBest = fx
        var t = 1.0
        val sigma0 = 0.1 * (upper - lower)
        for (_ <- 1 to maxIter * popSize) { // same evaluation budget as pop solvers
          val y = x.clone()
          val j = rnd.nextInt(obj.dim)
          y(j) = obj.clamp(y(j) + rnd.nextGaussian() * sigma0 * t)
          val fy = obj(y)
          if (fy < fx || rnd.nextDouble() < math.exp((fx - fy) / math.max(t, 1e-12))) {
            x = y; fx = fy
            if (fx < fBest) { fBest = fx; best = x.clone() }
          }
          t *= 0.9995
        }
        (fBest, best)

      case "tlbo" =>
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          // teacher phase: pull everyone toward the best, away from the mean
          val bi = fit.indices.minBy(fit)
          val mean = Array.tabulate(obj.dim)(d => pop.map(_(d)).sum / popSize)
          for (k <- pop.indices) {
            val tf = 1 + rnd.nextInt(2)
            val cand = Array.tabulate(obj.dim)(d =>
              obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - tf * mean(d))))
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
          // learner phase: pairwise move toward the better of a random pair
          for (k <- pop.indices) {
            val o = rnd.nextInt(popSize)
            if (o != k) {
              val (from, to) = if (fit(o) < fit(k)) (pop(k), pop(o)) else (pop(o), pop(k))
              val cand = Array.tabulate(obj.dim)(d =>
                obj.clamp(pop(k)(d) + rnd.nextDouble() * (to(d) - from(d))))
              val fc = obj(cand)
              if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
            }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case _ => // Jaya (the reference's default)
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          val best = pop(bi); val worst = pop(wi)
          for (k <- pop.indices) {
            val cand = Array.tabulate(obj.dim) { d =>
              val xv = pop(k)(d)
              obj.clamp(xv + rnd.nextDouble() * (best(d) - math.abs(xv))
                - rnd.nextDouble() * (worst(d) - math.abs(xv)))
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))
    }
  }

  /** Solve over a cost vector; `starts` seeded instances run as partition
    * tasks in parallel, best (fitness, seed) wins. */
  def orSolve(spark: SparkSession, costs: Array[Double], algorithm: String = "Jaya",
              lower: Double = 0.0, upper: Double = 1.0,
              minTotal: Double = 0.0, budget: Double = Double.NaN,
              popSize: Int = 30, maxIter: Int = 100,
              starts: Int = 8, seed: Long = 42L): SolveResult = {
    val sc = spark.sparkContext
    val bCosts = sc.broadcast(costs)
    val runs = sc.range(0, starts.toLong, 1, starts).map { s =>
      val obj = new Objective(bCosts.value, lower, upper, minTotal, budget)
      val (f, x) = solveOne(obj, algorithm, popSize, maxIter, lower, upper, seed + s)
      (f, s, x)
    }.collect()
    val (f, _, x) = runs.minBy(r => (r._1, r._2))
    SolveResult(algorithm, f, maxIter, x)
  }

  /** The CALL-surface form: nodes of `label`, costs from `costProp`
    * (nulls → 1.0, the reference's default). Returns one summary row
    * (algorithm, fitness, iterations, feasible, beats_uniform) — `feasible`
    * and `beats_uniform` are the engine-independent contract: the solution
    * meets Σx ≥ minTotal and costs less than the uniform allocation
    * x = minTotal/dim, which any functioning solver must. */
  def orSolveNodes(g: graft.model.PropertyGraph, label: String, costProp: String,
                   algorithm: String = "Jaya", lower: Double = 0.0, upper: Double = 1.0,
                   minTotal: Double = 0.0, budget: Double = Double.NaN,
                   popSize: Int = 30, maxIter: Int = 100, starts: Int = 8): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val costs = g.nodesWithLabel(label)
      .select(col("id"), coalesce(col(costProp).cast("double"), lit(1.0)).as("c"))
      .orderBy(col("id")) // deterministic variable order
      .collect().map(_.getDouble(1))
    val r = orSolve(spark, costs, algorithm, lower, upper, minTotal, budget,
      popSize, maxIter, starts)
    val tot = r.solution.sum
    val uniformFitness = {
      val u = math.max(lower, math.min(upper, minTotal / math.max(costs.length, 1)))
      costs.map(_ * u).sum
    }
    Seq((r.algorithm, r.fitness, r.iterations,
      tot >= minTotal - 1e-6, r.fitness < uniformFitness))
      .toDF("algorithm", "fitness", "iterations", "feasible", "beats_uniform")
  }
}
