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
  * Twenty-seven single-objective kernel families (the reference ships ~15
  * base families plus variants, `crates/samyama-optimization/src/algorithms/`
  * — 30 files), each implemented from its standard published formulation:
  * Jaya (the reference's default), SA, TLBO, ITLBO, GOTLBO, PSO, DE
  * (rand/1/bin), GWO, HS, ABC, GA (real-coded), Firefly, Cuckoo (Lévy
  * flights), Bat, Rao-1/-2/-3, QO-Jaya and QO-Rao (quasi-oppositional),
  * SAMP-Jaya (self-adaptive multi-population), FPA (flower pollination),
  * GSA (gravitational search), BMR, BWR and BMWR (best-mean/worst-random),
  * SAPHR (self-adaptive hybrid Rao) and EHR-Jaya (rank-split Jaya/Rao-1).
  * All share the restart-parallel harness and the (fitness, seed)
  * deterministic winner. The multi-objective families — NSGA-II, MO-TLBO,
  * MO-Rao-DE, and the MO-BMR/BWR/BMWR trio — run through the same
  * restart-parallel harness with a cross-start non-dominated merge; see
  * [[orSolveParetoNodes]].
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

      case "pso" => // particle swarm, global-best with constriction weights
        val w = 0.729; val c1 = 1.49445; val c2 = 1.49445
        val vmax = 0.2 * (upper - lower)
        val pop = Array.fill(popSize)(randX())
        val vel = Array.fill(popSize)(Array.fill(obj.dim)(0.0))
        val pBest = pop.map(_.clone()); val pFit = pop.map(obj(_))
        var gi = pFit.indices.minBy(pFit)
        for (_ <- 1 to maxIter) {
          for (k <- pop.indices) {
            for (d <- 0 until obj.dim) {
              val v = w * vel(k)(d) +
                c1 * rnd.nextDouble() * (pBest(k)(d) - pop(k)(d)) +
                c2 * rnd.nextDouble() * (pBest(gi)(d) - pop(k)(d))
              vel(k)(d) = math.max(-vmax, math.min(vmax, v))
              pop(k)(d) = obj.clamp(pop(k)(d) + vel(k)(d))
            }
            val f = obj(pop(k))
            if (f < pFit(k)) {
              pFit(k) = f; pBest(k) = pop(k).clone()
              if (f < pFit(gi)) gi = k
            }
          }
        }
        (pFit(gi), pBest(gi))

      case "de" => // differential evolution, rand/1/bin
        val fW = 0.5; val cr = 0.9
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          for (k <- pop.indices) {
            val a = rnd.nextInt(popSize); val b = rnd.nextInt(popSize)
            val c = rnd.nextInt(popSize)
            val jr = rnd.nextInt(obj.dim)
            val cand = Array.tabulate(obj.dim) { d =>
              if (d == jr || rnd.nextDouble() < cr)
                obj.clamp(pop(a)(d) + fW * (pop(b)(d) - pop(c)(d)))
              else pop(k)(d)
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "gwo" => // grey wolf: average of alpha/beta/delta-guided moves
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (it <- 1 to maxIter) {
          val order = fit.indices.sortBy(fit)
          val (al, be, de) = (pop(order(0)), pop(order(1)), pop(order(2)))
          val a = 2.0 * (1.0 - it.toDouble / maxIter)
          for (k <- pop.indices) {
            val cand = Array.tabulate(obj.dim) { d =>
              def lead(l: Array[Double]): Double = {
                val aa = 2 * a * rnd.nextDouble() - a
                val cc = 2 * rnd.nextDouble()
                l(d) - aa * math.abs(cc * l(d) - pop(k)(d))
              }
              obj.clamp((lead(al) + lead(be) + lead(de)) / 3.0)
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "hs" => // harmony search: memory consideration + pitch adjust
        val hmcr = 0.9; val par = 0.3; val bw = 0.05 * (upper - lower)
        val mem = Array.fill(popSize)(randX())
        val fit = mem.map(obj(_))
        for (_ <- 1 to maxIter * popSize / 2) {
          val cand = Array.tabulate(obj.dim) { d =>
            if (rnd.nextDouble() < hmcr) {
              var v = mem(rnd.nextInt(popSize))(d)
              if (rnd.nextDouble() < par) v += (2 * rnd.nextDouble() - 1) * bw
              obj.clamp(v)
            } else lower + rnd.nextDouble() * (upper - lower)
          }
          val fc = obj(cand)
          val wi = fit.indices.maxBy(fit)
          if (fc < fit(wi)) { mem(wi) = cand; fit(wi) = fc }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), mem(bi))

      case "abc" => // artificial bee colony: employed/onlooker/scout phases
        val limit = 20
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        val trials = Array.fill(popSize)(0)
        def neighbor(k: Int): Unit = {
          val o = rnd.nextInt(popSize)
          val d = rnd.nextInt(obj.dim)
          val cand = pop(k).clone()
          cand(d) = obj.clamp(cand(d) + (2 * rnd.nextDouble() - 1) * (cand(d) - pop(o)(d)))
          val fc = obj(cand)
          if (fc < fit(k)) { pop(k) = cand; fit(k) = fc; trials(k) = 0 }
          else trials(k) += 1
        }
        for (_ <- 1 to maxIter) {
          for (k <- pop.indices) neighbor(k) // employed
          for (_ <- pop.indices) { // onlookers: fitness-proportional choice
            val weights = fit.map(f => 1.0 / (1.0 + math.max(f, 0.0)))
            val total = weights.sum
            var pick = rnd.nextDouble() * total; var k = 0
            while (k < popSize - 1 && pick > weights(k)) { pick -= weights(k); k += 1 }
            neighbor(k)
          }
          for (k <- pop.indices if trials(k) > limit) { // scouts
            pop(k) = randX(); fit(k) = obj(pop(k)); trials(k) = 0
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "ga" => // real-coded GA: tournament + blend crossover + mutation
        var pop = Array.fill(popSize)(randX())
        var fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          def tourney(): Array[Double] = {
            val a = rnd.nextInt(popSize); val b = rnd.nextInt(popSize)
            if (fit(a) < fit(b)) pop(a) else pop(b)
          }
          val elite = pop(fit.indices.minBy(fit)).clone()
          val next = Array.fill(popSize - 1) {
            val (p1, p2) = (tourney(), tourney())
            Array.tabulate(obj.dim) { d =>
              val g = rnd.nextDouble()
              var v = g * p1(d) + (1 - g) * p2(d) // blend crossover
              if (rnd.nextDouble() < 0.1)
                v += rnd.nextGaussian() * 0.1 * (upper - lower) // mutation
              obj.clamp(v)
            }
          } :+ elite
          pop = next
          fit = pop.map(obj(_))
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "firefly" => // move toward brighter fireflies, intensity decays
        val beta0 = 1.0; val gamma = 1.0 / math.pow(upper - lower, 2)
        val alpha0 = 0.1 * (upper - lower)
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (it <- 1 to maxIter) {
          val alpha = alpha0 * math.pow(0.97, it)
          for (k <- pop.indices; o <- pop.indices if fit(o) < fit(k)) {
            var r2 = 0.0
            for (d <- 0 until obj.dim) { val dd = pop(k)(d) - pop(o)(d); r2 += dd * dd }
            val beta = beta0 * math.exp(-gamma * r2)
            for (d <- 0 until obj.dim)
              pop(k)(d) = obj.clamp(pop(k)(d) + beta * (pop(o)(d) - pop(k)(d)) +
                alpha * (rnd.nextDouble() - 0.5))
            fit(k) = obj(pop(k))
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "cuckoo" => // cuckoo search: Lévy flights + nest abandonment
        val pa = 0.25
        // Mantegna sigma for beta = 1.5 (closed-form constant)
        val levyBeta = 1.5; val sigma = 0.6966
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          for (k <- pop.indices) {
            val cand = Array.tabulate(obj.dim) { d =>
              val step = sigma * rnd.nextGaussian() /
                math.pow(math.abs(rnd.nextGaussian()) + 1e-12, 1.0 / levyBeta)
              obj.clamp(pop(k)(d) + 0.01 * step * (pop(k)(d) - pop(bi)(d)))
            }
            val fc = obj(cand)
            val o = rnd.nextInt(popSize)
            if (fc < fit(o)) { pop(o) = cand; fit(o) = fc }
          }
          for (k <- pop.indices if rnd.nextDouble() < pa) { // abandon worst nests
            val a = rnd.nextInt(popSize); val b = rnd.nextInt(popSize)
            for (d <- 0 until obj.dim)
              pop(k)(d) = obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(a)(d) - pop(b)(d)))
            fit(k) = obj(pop(k))
          }
        }
        val b2 = fit.indices.minBy(fit)
        (fit(b2), pop(b2))

      case "bat" => // bat algorithm: frequency tuning + loudness/pulse rate
        val fMin = 0.0; val fMax = 2.0
        var loud = 1.0; var pulse = 0.5
        val pop = Array.fill(popSize)(randX())
        val vel = Array.fill(popSize)(Array.fill(obj.dim)(0.0))
        val fit = pop.map(obj(_))
        var bi = fit.indices.minBy(fit)
        for (it <- 1 to maxIter) {
          loud = math.pow(0.97, it)
          pulse = 0.5 * (1 - math.exp(-0.1 * it))
          for (k <- pop.indices) {
            val freq = fMin + (fMax - fMin) * rnd.nextDouble()
            val cand = Array.tabulate(obj.dim) { d =>
              vel(k)(d) += (pop(k)(d) - pop(bi)(d)) * freq
              obj.clamp(pop(k)(d) + vel(k)(d))
            }
            val local =
              if (rnd.nextDouble() > pulse)
                Array.tabulate(obj.dim)(d =>
                  obj.clamp(pop(bi)(d) + 0.01 * rnd.nextGaussian() * loud * (upper - lower)))
              else cand
            val fc = obj(local)
            if (fc < fit(k) && rnd.nextDouble() < loud) {
              pop(k) = local; fit(k) = fc
              if (fc < fit(bi)) bi = k
            }
          }
        }
        (fit(bi), pop(bi))

      case "rao" | "rao1" => // Rao-1: parameter-free best-worst move
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          for (k <- pop.indices) {
            val cand = Array.tabulate(obj.dim)(d =>
              obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - pop(wi)(d))))
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "rao2" | "rao3" => // Rao-2 / Rao-3 (Rao 2020): best-worst move plus
        // a random-partner interaction term; Rao-3 uses the |worst| variant
        val isR3 = algorithm.equalsIgnoreCase("rao3")
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          for (k <- pop.indices) {
            val l = rnd.nextInt(popSize)
            val kFitter = fit(k) <= fit(l)
            val cand = Array.tabulate(obj.dim) { d =>
              val pull =
                if (isR3) rnd.nextDouble() * (pop(bi)(d) - math.abs(pop(wi)(d)))
                else rnd.nextDouble() * (pop(bi)(d) - pop(wi)(d))
              val (hi, lo) = if (kFitter) (pop(k)(d), pop(l)(d)) else (pop(l)(d), pop(k)(d))
              val interact =
                if (isR3) rnd.nextDouble() * (math.abs(hi) - lo)
                else rnd.nextDouble() * (math.abs(hi) - math.abs(lo))
              obj.clamp(pop(k)(d) + pull + interact)
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "qojaya" => // quasi-oppositional Jaya (Rao & Rai 2017): QO init +
        // QO jumping — quasi-opposite points sampled between the interval
        // center and the opposite point widen early exploration
        def quasiOpposite(x: Array[Double]): Array[Double] = Array.tabulate(obj.dim) { d =>
          val c = (lower + upper) / 2.0
          val o = lower + upper - x(d)
          val (a, b) = if (c < o) (c, o) else (o, c)
          a + rnd.nextDouble() * (b - a)
        }
        def keepBest(cands: Array[Array[Double]]): (Array[Array[Double]], Array[Double]) = {
          val scored = cands.map(x => (obj(x), x)).sortBy(_._1).take(popSize)
          (scored.map(_._2), scored.map(_._1))
        }
        var (pop, fit) = keepBest(Array.fill(popSize)(randX()).flatMap(x => Seq(x, quasiOpposite(x))))
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
          if (rnd.nextDouble() < 0.3) { // QO jumping
            val r = keepBest(pop ++ pop.map(quasiOpposite))
            pop = r._1; fit = r._2
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "sampjaya" => // self-adaptive multi-population Jaya (Rao & Saroj
        // 2017): the population splits into m fitness-sorted round-robin
        // subgroups, each moving toward its OWN best/worst; m grows while the
        // global best improves and shrinks when it stalls
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        var m = 2
        var prevBest = fit.min
        for (_ <- 1 to maxIter) {
          val order = fit.indices.sortBy(fit)
          val groups = order.zipWithIndex.groupMap(_._2 % m)(_._1)
          groups.values.foreach { idxs =>
            val bi = idxs.minBy(fit); val wi = idxs.maxBy(fit)
            val best = pop(bi); val worst = pop(wi)
            idxs.foreach { k =>
              val cand = Array.tabulate(obj.dim) { d =>
                val xv = pop(k)(d)
                obj.clamp(xv + rnd.nextDouble() * (best(d) - math.abs(xv))
                  - rnd.nextDouble() * (worst(d) - math.abs(xv)))
              }
              val fc = obj(cand)
              if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
            }
          }
          val cur = fit.min
          m = if (cur < prevBest) math.min(m + 1, math.max(popSize / 4, 1))
              else math.max(m - 1, 1)
          prevBest = cur
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "qorao" => // quasi-oppositional Rao-1: the QO-Jaya machinery
        // (QO init + QO jumping) around the parameter-free Rao-1 move
        def quasiOppositeR(x: Array[Double]): Array[Double] = Array.tabulate(obj.dim) { d =>
          val c = (lower + upper) / 2.0
          val o = lower + upper - x(d)
          val (a, b) = if (c < o) (c, o) else (o, c)
          a + rnd.nextDouble() * (b - a)
        }
        def keepBestR(cands: Array[Array[Double]]): (Array[Array[Double]], Array[Double]) = {
          val scored = cands.map(x => (obj(x), x)).sortBy(_._1).take(popSize)
          (scored.map(_._2), scored.map(_._1))
        }
        var (pop, fit) = keepBestR(Array.fill(popSize)(randX()).flatMap(x => Seq(x, quasiOppositeR(x))))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          for (k <- pop.indices) {
            val cand = Array.tabulate(obj.dim)(d =>
              obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - pop(wi)(d))))
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
          if (rnd.nextDouble() < 0.3) { // QO jumping
            val r = keepBestR(pop ++ pop.map(quasiOppositeR))
            pop = r._1; fit = r._2
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "itlbo" | "gotlbo" => // improved / generalized-oppositional TLBO:
        // the TLBO teacher+learner phases plus, per the published variants,
        // an elite-replacement step (ITLBO, Rao & Patel 2013) or
        // opposition-based generation jumping (GOTLBO, Chen et al. 2016)
        val isGo = algorithm.equalsIgnoreCase("gotlbo")
        var pop = Array.fill(popSize)(randX())
        var fit = pop.map(obj(_))
        val nElite = math.max(1, popSize / 10)
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val mean = Array.tabulate(obj.dim)(d => pop.map(_(d)).sum / popSize)
          for (k <- pop.indices) { // teacher phase
            val tf = 1 + rnd.nextInt(2)
            val cand = Array.tabulate(obj.dim)(d =>
              obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - tf * mean(d))))
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
          for (k <- pop.indices) { // learner phase
            val o = rnd.nextInt(popSize)
            if (o != k) {
              val (from, to) = if (fit(o) < fit(k)) (pop(k), pop(o)) else (pop(o), pop(k))
              val cand = Array.tabulate(obj.dim)(d =>
                obj.clamp(pop(k)(d) + rnd.nextDouble() * (to(d) - from(d))))
              val fc = obj(cand)
              if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
            }
          }
          if (isGo) {
            if (rnd.nextDouble() < 0.3) { // generalized-opposition jumping
              val kj = rnd.nextDouble()
              val jumped = pop.map(x => Array.tabulate(obj.dim)(d =>
                obj.clamp(kj * (lower + upper) - x(d))))
              val scored = (pop ++ jumped).map(x => (obj(x), x)).sortBy(_._1).take(popSize)
              pop = scored.map(_._2); fit = scored.map(_._1)
            }
          } else { // ITLBO elite replacement: worst learners become elites
            val order = fit.indices.sortBy(fit)
            val elites = order.take(nElite).map(pop(_).clone())
            order.takeRight(nElite).zip(elites).foreach { case (w, e) =>
              pop(w) = e; fit(w) = obj(e)
            }
          }
        }
        val b2 = fit.indices.minBy(fit)
        (fit(b2), pop(b2))

      case "bmwr" => // Best-Mean-Worst-Random (Rao 2024 BMR/BWR family):
        // both the mean pull and the worst repulsion in one move
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          val mean = Array.tabulate(obj.dim)(d => pop.map(_(d)).sum / popSize)
          for (k <- pop.indices) {
            val cand =
              if (rnd.nextDouble() > 0.5) Array.tabulate(obj.dim) { d =>
                val t = 1 + rnd.nextInt(2)
                val rIdx = pop(rnd.nextInt(popSize))(d)
                obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - t * mean(d))
                  - rnd.nextDouble() * (pop(wi)(d) - rIdx))
              }
              else randX()
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "fpa" => // flower pollination (Yang 2012): Lévy global pollination
        // with switch probability p, uniform local pollination otherwise
        val p = 0.8
        val levyBeta = 1.5; val sigma = 0.6966 // Mantegna sigma for beta=1.5
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        var bi = fit.indices.minBy(fit)
        for (_ <- 1 to maxIter) {
          for (k <- pop.indices) {
            val cand =
              if (rnd.nextDouble() < p) Array.tabulate(obj.dim) { d =>
                val step = sigma * rnd.nextGaussian() /
                  math.pow(math.abs(rnd.nextGaussian()) + 1e-12, 1.0 / levyBeta)
                obj.clamp(pop(k)(d) + 0.1 * step * (pop(bi)(d) - pop(k)(d)))
              }
              else {
                val a = rnd.nextInt(popSize); val b = rnd.nextInt(popSize)
                val eps = rnd.nextDouble()
                Array.tabulate(obj.dim)(d => obj.clamp(pop(k)(d) + eps * (pop(a)(d) - pop(b)(d))))
              }
            val fc = obj(cand)
            if (fc < fit(k)) {
              pop(k) = cand; fit(k) = fc
              if (fc < fit(bi)) bi = k
            }
          }
        }
        (fit(bi), pop(bi))

      case "gsa" => // gravitational search (Rashedi et al. 2009): fitness-
        // proportional masses attract agents; gravity decays over iterations
        val g0 = 1.0; val eps = 1e-12
        val pop = Array.fill(popSize)(randX())
        val vel = Array.fill(popSize)(Array.fill(obj.dim)(0.0))
        val fit = pop.map(obj(_))
        for (it <- 1 to maxIter) {
          val gC = g0 * math.exp(-20.0 * it / maxIter)
          val fMin = fit.min; val fMax = fit.max
          val m = fit.map(f => (fMax - f + eps) / math.max(fMax - fMin, eps))
          val mSum = m.sum
          // kbest shrinks linearly: all agents attract early, only the best late
          val kbest = math.max(1, (popSize * (1.0 - 0.75 * it.toDouble / maxIter)).toInt)
          val leaders = fit.indices.sortBy(fit).take(kbest)
          for (k <- pop.indices) {
            val acc = Array.fill(obj.dim)(0.0)
            leaders.foreach { l =>
              if (l != k) {
                var r2 = 0.0
                for (d <- 0 until obj.dim) { val dd = pop(l)(d) - pop(k)(d); r2 += dd * dd }
                val r = math.sqrt(r2) + eps
                val pull = gC * (m(l) / mSum) / r
                for (d <- 0 until obj.dim) acc(d) += rnd.nextDouble() * pull * (pop(l)(d) - pop(k)(d))
              }
            }
            for (d <- 0 until obj.dim) {
              vel(k)(d) = rnd.nextDouble() * vel(k)(d) + acc(d) * (upper - lower)
              pop(k)(d) = obj.clamp(pop(k)(d) + vel(k)(d))
            }
            fit(k) = obj(pop(k))
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "bmr" | "bwr" => // Rao & collaborators 2024, metaphor-free
        // Best-Mean-Random / Best-Worst-Random: exploit toward best vs mean
        // (BMR) or away from worst (BWR), with occasional bound reinit
        val isBwr = algorithm.equalsIgnoreCase("bwr")
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          val mean = Array.tabulate(obj.dim)(d => pop.map(_(d)).sum / popSize)
          for (k <- pop.indices) {
            val cand =
              if (rnd.nextDouble() > 0.5) Array.tabulate(obj.dim) { d =>
                val t = 1 + rnd.nextInt(2)
                val rIdx = pop(rnd.nextInt(popSize))(d)
                if (isBwr)
                  obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - t * rIdx)
                    - rnd.nextDouble() * (pop(wi)(d) - rIdx))
                else
                  obj.clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - t * mean(d))
                    + rnd.nextDouble() * (pop(bi)(d) - rIdx))
              }
              else randX() // published reinit branch keeps diversity
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "saphr" => // SAPHR — self-adaptive population hybrid Rao (Water
        // Resources Management 2025, doi:10.1007/s11269-025-04186-7;
        // reference algorithms/saphr.rs): the three Rao moves compete — each
        // individual picks a variant proportionally to its Laplace-smoothed
        // success count, with epsilon-greedy exploration; greedy acceptance
        // credits the winning variant
        val epsilon = 0.2
        val pop = Array.fill(popSize)(randX())
        val fit = pop.map(obj(_))
        val success = Array(1.0, 1.0, 1.0)
        for (_ <- 1 to maxIter) {
          val bi = fit.indices.minBy(fit)
          val wi = fit.indices.maxBy(fit)
          val best = pop(bi); val worst = pop(wi)
          for (k <- pop.indices) {
            val chosen =
              if (rnd.nextDouble() < epsilon) rnd.nextInt(3)
              else {
                val pick = rnd.nextDouble() * success.sum
                if (pick < success(0)) 0
                else if (pick < success(0) + success(1)) 1
                else 2
              }
            val l = rnd.nextInt(popSize)
            val kFitter = fit(k) <= fit(l)
            val cand = Array.tabulate(obj.dim) { d =>
              val (hi, lo) = if (kFitter) (pop(k)(d), pop(l)(d)) else (pop(l)(d), pop(k)(d))
              val move = chosen match {
                case 0 => // Rao-1: parameter-free best-worst pull
                  rnd.nextDouble() * (best(d) - worst(d))
                case 1 => // Rao-2: best-worst pull + |.|-ordered interaction
                  rnd.nextDouble() * (best(d) - worst(d)) +
                    rnd.nextDouble() * (math.abs(hi) - math.abs(lo))
                case _ => // Rao-3: |worst| pull + mixed interaction
                  rnd.nextDouble() * (best(d) - math.abs(worst(d))) +
                    rnd.nextDouble() * (math.abs(hi) - lo)
              }
              obj.clamp(pop(k)(d) + move)
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc; success(chosen) += 1.0 }
          }
        }
        val bi = fit.indices.minBy(fit)
        (fit(bi), pop(bi))

      case "ehrjaya" => // EHR-Jaya — rank-classified hybrid Jaya + Rao-1
        // (Wang et al. 2022, EAAI; reference algorithms/ehrjaya.rs): each
        // iteration ranks the population; the high-performing top half takes
        // the Rao-1 best-worst pull, the low-performing bottom half takes the
        // Jaya best-pull/worst-push; greedy acceptance
        var pop = Array.fill(popSize)(randX())
        var fit = pop.map(obj(_))
        val half = popSize / 2
        for (_ <- 1 to maxIter) {
          val order = fit.indices.sortBy(fit).toArray
          pop = order.map(pop); fit = order.map(fit)
          val best = pop(0); val worst = pop(popSize - 1)
          for (k <- pop.indices) {
            val r1 = rnd.nextDouble(); val r2 = rnd.nextDouble()
            val cand = Array.tabulate(obj.dim) { d =>
              val xv = pop(k)(d)
              if (k < half) obj.clamp(xv + r1 * (best(d) - worst(d)))
              else obj.clamp(xv + r1 * (best(d) - math.abs(xv))
                - r2 * (worst(d) - math.abs(xv)))
            }
            val fc = obj(cand)
            if (fc < fit(k)) { pop(k) = cand; fit(k) = fc }
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
  /** (id, cost) pairs of `label` in deterministic id order — the variable
    * order of the solve. Label-bounded collect: the same in-memory commitment
    * the reference makes building its cost vector. */
  private def labelCosts(g: graft.model.PropertyGraph, label: String,
                         costProp: String): (Array[Long], Array[Double]) = {
    val rows = g.nodesWithLabel(label)
      .select(col("id"), coalesce(col(costProp).cast("double"), lit(1.0)).as("c"))
      .orderBy(col("id"))
      .collect()
    (rows.map(_.getLong(0)), rows.map(_.getDouble(1)))
  }

  def orSolveNodes(g: graft.model.PropertyGraph, label: String, costProp: String,
                   algorithm: String = "Jaya", lower: Double = 0.0, upper: Double = 1.0,
                   minTotal: Double = 0.0, budget: Double = Double.NaN,
                   popSize: Int = 30, maxIter: Int = 100, starts: Int = 8): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (_, costs) = labelCosts(g, label, costProp)
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

  /** Write-back form (reference `operator.rs:6617-6767` dispatches a MUTATING
    * algorithm op over `src/optimization/cypher_problem.rs` — the solution is
    * written onto the nodes, so `CALL algo.or.solve(...)` followed by
    * `MATCH (n) RETURN n.<writeProp>` works): solves over the label's cost
    * vector, then joins the per-node allocation back as `writeProp`, keyed by
    * the SAME deterministic id order the cost vector was built from. Returns
    * the mutated graph and the number of properties written. */
  def orSolveNodesWrite(g: graft.model.PropertyGraph, label: String, costProp: String,
                        writeProp: String, algorithm: String = "Jaya",
                        lower: Double = 0.0, upper: Double = 1.0,
                        minTotal: Double = 0.0, budget: Double = Double.NaN,
                        popSize: Int = 30, maxIter: Int = 100,
                        starts: Int = 8): (graft.model.PropertyGraph, Long) = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (ids, costs) = labelCosts(g, label, costProp)
    val r = orSolve(spark, costs, algorithm, lower, upper, minTotal, budget,
      popSize, maxIter, starts)
    val values = ids.zip(r.solution).toSeq.toDF("id", writeProp)
    (graft.model.GraphMutations.setNodePropValues(g, values, writeProp), ids.length.toLong)
  }

  // ---------- Pareto bi-objective families (reference nsga2.rs,
  // motlbo.rs, mo_rao_de.rs) ----------

  /** One Pareto-front run over two minimization objectives — total cost
    * Σcᵢxᵢ and negated total allocation −Σxᵢ. The non-dominated-sorting +
    * crowding-distance + (μ+λ) truncation machinery (Deb et al. 2002) is
    * shared; `variant` selects the variation operator:
    *   - "nsga2"   — binary tournament + SBX crossover + polynomial mutation
    *   - "motlbo"  — multi-objective TLBO: teacher pull toward a front-0
    *                 individual minus TF·mean, then a learner move along a
    *                 random pair ordered by (rank, crowding)
    *   - "moraode" — alternating Rao-1 best-worst moves (best/worst by
    *                 (rank, crowding)) and DE rand/1/bin mutants
    * Returns the final front's objective pairs. */
  private def paretoFront(costs: Array[Double], lower: Double, upper: Double,
                          popSize: Int, maxIter: Int, seed: Long,
                          variant: String): Array[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    val dim = costs.length
    def clamp(v: Double) = math.max(lower, math.min(upper, v))
    def evalF(x: Array[Double]): (Double, Double) = {
      var c = 0.0; var t = 0.0; var i = 0
      while (i < dim) { c += costs(i) * x(i); t += x(i); i += 1 }
      (c, -t)
    }
    def dominates(a: (Double, Double), b: (Double, Double)): Boolean =
      a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)

    /** (rank, crowding distance) per individual — O(n²) dominance counting;
      * populations here are tens of individuals, never the data. */
    def rankAndCrowd(fs: Array[(Double, Double)]): (Array[Int], Array[Double]) = {
      val n = fs.length
      val rank = Array.fill(n)(0)
      val domCount = Array.fill(n)(0)
      val dominated = Array.fill(n)(List.empty[Int])
      for (i <- 0 until n; j <- 0 until n if i != j)
        if (dominates(fs(i), fs(j))) dominated(i) ::= j
        else if (dominates(fs(j), fs(i))) domCount(i) += 1
      var front = (0 until n).filter(domCount(_) == 0).toList
      var r = 0
      while (front.nonEmpty) {
        front.foreach(rank(_) = r)
        val next = scala.collection.mutable.ListBuffer[Int]()
        front.foreach { i =>
          dominated(i).foreach { j =>
            domCount(j) -= 1; if (domCount(j) == 0) next += j
          }
        }
        front = next.toList; r += 1
      }
      val crowd = Array.fill(n)(0.0)
      (0 until n).groupBy(rank).values.foreach { idx =>
        for (m <- 0 until 2) {
          val key: Int => Double = if (m == 0) i => fs(i)._1 else i => fs(i)._2
          val sorted = idx.sortBy(key)
          if (sorted.size > 2) {
            val span = math.max(key(sorted.last) - key(sorted.head), 1e-12)
            crowd(sorted.head) = Double.PositiveInfinity
            crowd(sorted.last) = Double.PositiveInfinity
            for (k <- 1 until sorted.size - 1 if !crowd(sorted(k)).isInfinity)
              crowd(sorted(k)) += (key(sorted(k + 1)) - key(sorted(k - 1))) / span
          } else sorted.foreach(crowd(_) = Double.PositiveInfinity)
        }
      }
      (rank, crowd)
    }

    var pop = Array.fill(popSize)(Array.fill(dim)(lower + rnd.nextDouble() * (upper - lower)))
    var fs = pop.map(evalF)
    val etaC = 15.0; val etaM = 20.0; val pm = 1.0 / math.max(dim, 1)
    for (_ <- 1 to maxIter) {
      val (rank, crowd) = rankAndCrowd(fs)
      // (rank asc, crowding desc) — the MOO "better than" used by every variant
      def beats(a: Int, b: Int): Boolean =
        rank(a) < rank(b) || (rank(a) == rank(b) && crowd(a) > crowd(b))
      val front0 = fs.indices.filter(rank(_) == 0)
      def leader(): Int = front0(rnd.nextInt(front0.size)) // a random front-0 member
      val offspring: Array[Array[Double]] = variant match {
        case "motlbo" =>
          val mean = Array.tabulate(dim)(d => pop.map(_(d)).sum / popSize)
          Array.tabulate(popSize) { k =>
            val t = pop(leader())
            val tf = 1 + rnd.nextInt(2)
            val taught = Array.tabulate(dim)(d =>
              clamp(pop(k)(d) + rnd.nextDouble() * (t(d) - tf * mean(d))))
            // learner move along a random pair ordered by (rank, crowding)
            val o = rnd.nextInt(popSize)
            val (from, to) = if (beats(o, k)) (pop(k), pop(o)) else (pop(o), pop(k))
            Array.tabulate(dim)(d =>
              clamp(taught(d) + rnd.nextDouble() * (to(d) - from(d))))
          }
        case "moraode" =>
          // "worst" = max rank, then min crowding
          val wi = fs.indices.maxBy(i => (rank(i), -crowd(i)))
          Array.tabulate(popSize) { k =>
            if (k % 2 == 0) { // Rao-1 move with MOO best/worst
              val bi = leader()
              Array.tabulate(dim)(d =>
                clamp(pop(k)(d) + rnd.nextDouble() * (pop(bi)(d) - pop(wi)(d))))
            } else { // DE rand/1/bin
              val a = rnd.nextInt(popSize); val b = rnd.nextInt(popSize)
              val c = rnd.nextInt(popSize)
              val jr = rnd.nextInt(dim)
              Array.tabulate(dim) { d =>
                if (d == jr || rnd.nextDouble() < 0.9)
                  clamp(pop(a)(d) + 0.5 * (pop(b)(d) - pop(c)(d)))
                else pop(k)(d)
              }
            }
          }
        case v @ ("mobmr" | "mobwr" | "mobmwr") =>
          // MO-BMR / MO-BWR / MO-BMWR (Rao 2025/2026, MDPI Metals 15/9/1057 +
          // Energies 19/1/34 + JMMP 9/8/249; reference
          // algorithms/mo_bmwr_family.rs): the metaphor-free
          // best-mean/worst-random move against a random front-0 elite and a
          // random worst-rank member, with the paper's three extra offspring
          // sources — bound-reinit diversity, Gaussian local exploration
          // around elites, and per-objective edge boosting of the front
          val maxRank = rank.max
          val worstPool = fs.indices.filter(rank(_) == maxRank)
          val mean = Array.tabulate(dim)(d => pop.map(_(d)).sum / popSize)
          val localStep = 0.05; val edgeBoostProb = 0.2
          val base = Array.tabulate(popSize) { k =>
            if (rnd.nextDouble() > 0.5) {
              val bestRef = pop(leader())
              val worstRef = pop(worstPool(rnd.nextInt(worstPool.size)))
              val t = 1 + rnd.nextInt(2)
              var rk = rnd.nextInt(popSize)
              if (rk == k && popSize > 1) rk = (rk + 1) % popSize
              val rv = pop(rk)
              val r1 = rnd.nextDouble(); val r2 = rnd.nextDouble(); val r5 = rnd.nextDouble()
              Array.tabulate(dim) { d =>
                val delta = v match {
                  case "mobmr" => r1 * (bestRef(d) - t * mean(d)) + r2 * (bestRef(d) - rv(d))
                  case "mobwr" => r1 * (bestRef(d) - t * rv(d)) - r2 * (worstRef(d) - rv(d))
                  case _ => r1 * (bestRef(d) - t * mean(d)) + r2 * (bestRef(d) - rv(d)) -
                    r5 * (worstRef(d) - rv(d))
                }
                clamp(pop(k)(d) + delta)
              }
            } else { // published bound-reinit branch keeps diversity
              val r3 = rnd.nextDouble()
              Array.fill(dim)(clamp(upper - (upper - lower) * r3))
            }
          }
          val local = Array.fill(math.max(popSize / 10, 1)) { // explore near elites
            val e = pop(leader())
            Array.tabulate(dim)(d =>
              clamp(e(d) + localStep * (upper - lower) * rnd.nextGaussian()))
          }
          val edges = // occasionally push the per-objective extremes outward
            if (rnd.nextDouble() < edgeBoostProb)
              Array.tabulate(2) { m =>
                val ei = front0.minBy(i => if (m == 0) fs(i)._1 else fs(i)._2)
                Array.tabulate(dim)(d =>
                  clamp(pop(ei)(d) + 0.5 * localStep * (upper - lower) * rnd.nextGaussian()))
              }
            else Array.empty[Array[Double]]
          base ++ local ++ edges
        case _ => // NSGA-II: tournament + SBX + polynomial mutation
          def tourney(): Array[Double] = {
            val a = rnd.nextInt(pop.length); val b = rnd.nextInt(pop.length)
            if (beats(a, b)) pop(a) else pop(b)
          }
          Array.fill(popSize) {
            val p1 = tourney(); val p2 = tourney()
            val child = Array.tabulate(dim) { d =>
              val v =
                if (rnd.nextDouble() < 0.5) { // SBX blend
                  val u = rnd.nextDouble()
                  val beta =
                    if (u <= 0.5) math.pow(2 * u, 1 / (etaC + 1))
                    else math.pow(1.0 / (2 * (1 - u)), 1 / (etaC + 1))
                  0.5 * ((1 + beta) * p1(d) + (1 - beta) * p2(d))
                } else p1(d)
              clamp(v)
            }
            for (d <- 0 until dim if rnd.nextDouble() < pm) { // polynomial mutation
              val u = rnd.nextDouble()
              val delta =
                if (u < 0.5) math.pow(2 * u, 1 / (etaM + 1)) - 1
                else 1 - math.pow(2 * (1 - u), 1 / (etaM + 1))
              child(d) = clamp(child(d) + delta * (upper - lower))
            }
            child
          }
      }
      val allPop = pop ++ offspring
      val allF = fs ++ offspring.map(evalF)
      val (r2, c2) = rankAndCrowd(allF)
      val sel = allPop.indices.sortBy(i => (r2(i), -c2(i))).take(popSize)
      pop = sel.map(allPop).toArray
      fs = sel.map(allF).toArray
    }
    val (rF, _) = rankAndCrowd(fs)
    fs.indices.filter(rF(_) == 0).map(fs).toArray
  }

  /** 2-D hypervolume (minimization) of a point set against a reference point
    * dominated by every set member: sweep f1-ascending, each surviving point
    * contributes (ref₁−f1)·(prevF2−f2). */
  private def hypervolume2(points: Array[(Double, Double)], ref: (Double, Double)): Double = {
    val sorted = points.filter(p => p._1 < ref._1 && p._2 < ref._2)
      .sortBy(p => (p._1, p._2))
    var hv = 0.0; var prevB = ref._2
    for ((a, b) <- sorted if b < prevB) {
      hv += (ref._1 - a) * (prevB - b)
      prevB = b
    }
    hv
  }

  /** The multi-objective CALL surface (reference `nsga2.rs`, `motlbo.rs`,
    * `mo_rao_de.rs`): Pareto front over (total cost, −total allocation),
    * restart-parallel like the single-objective harness — each seeded run is
    * a partition task, fronts merge on the driver through one final
    * non-dominated filter. The engine-independent contract YIELDed: a
    * non-trivial front (≥2 trade-off points) whose hypervolume strictly
    * contains the uniform allocation x = minTotal/dim. */
  def orSolveParetoNodes(g: graft.model.PropertyGraph, label: String, costProp: String,
                         algorithm: String = "NSGA2",
                         minTotal: Double = 0.0, lower: Double = 0.0, upper: Double = 1.0,
                         popSize: Int = 40, maxIter: Int = 60,
                         starts: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val variant = algorithm.toLowerCase.replace("-", "") match {
      case "motlbo" => "motlbo"
      case "moraode" | "moraode1" | "morao" => "moraode"
      case "mobmr" => "mobmr"
      case "mobwr" => "mobwr"
      case "mobmwr" => "mobmwr"
      case _ => "nsga2"
    }
    val (_, costs) = labelCosts(g, label, costProp)
    val bCosts = spark.sparkContext.broadcast(costs)
    val merged = spark.sparkContext.range(0, starts.toLong, 1, starts)
      .map(s => paretoFront(bCosts.value, lower, upper, popSize, maxIter, seed + s, variant))
      .collect().flatten.sortBy(p => (p._1, p._2))
    var bestB = Double.PositiveInfinity
    val front = merged.filter { case (_, b) => val keep = b < bestB; if (keep) bestB = b; keep }
    val ref = (costs.map(c => math.max(c, 0.0) * upper).sum + 1.0, 1.0)
    val hv = hypervolume2(front, ref)
    val u = math.max(lower, math.min(upper, minTotal / math.max(costs.length, 1)))
    val uniHv = hypervolume2(Array((costs.map(_ * u).sum, -u * costs.length)), ref)
    Seq((algorithm, front.length.toLong, hv, front.length >= 2, hv > uniHv))
      .toDF("algorithm", "front_size", "hypervolume", "has_front", "beats_uniform")
  }
}
