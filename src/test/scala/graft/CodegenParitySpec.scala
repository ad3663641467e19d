package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Codegen ↔ interpreted parity, enforced wholesale.
  *
  * Every native Catalyst expression in this engine carries TWO
  * execution paths: `nullSafeEval` (interpreted) and `doGenCode`
  * (whole-stage codegen). Spark picks per plan — and falls back to
  * the interpreted path at runtime whenever a generated method trips
  * the 64 KB JIT limit or codegen compilation fails — so a divergence
  * between the two paths is a SILENT wrong-answer bug that no
  * single-mode oracle run can catch: the oracle gate executes each
  * query in whichever mode Spark happened to pick.
  *
  * This sweep runs every declared query whose optimized plan contains
  * a graft native expression twice — once under the default conf
  * (whole-stage codegen on) and once with codegen hard-disabled
  * (`spark.sql.codegen.wholeStage=false` +
  * `spark.sql.codegen.factoryMode=NO_CODEGEN`, the conf pair Spark
  * itself uses to force interpreted execution in its own test suite) —
  * and requires identical rows. The engine's expressions delegate both
  * paths to one static method, so parity should hold by construction;
  * the sweep is the gate that keeps that true for every FUTURE
  * expression (a hand-rolled doGenCode that drifts from eval is
  * exactly the bug class this catches).
  *
  * Gate-canary discipline (see WindowGateSpec): a deliberately
  * divergent expression — eval returns x+1, codegen returns x+2 —
  * must make the two modes disagree, proving the conf flip actually
  * changes the execution path (a sweep whose knob never engages
  * proves nothing).
  */
class CodegenParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private val WholeStageKey = "spark.sql.codegen.wholeStage"
  private val FactoryKey = "spark.sql.codegen.factoryMode"

  /** Queries whose optimized plan (subqueries included) contains at
    * least one graft native expression — the only surface where the
    * engine itself contributes a codegen path that could diverge.
    * Detected on [[SharedPlans]] (one shared plan construction for
    * all plan sweeps, built in noCut mode) — so expressions BELOW a
    * Checkpoints.cut count toward the scope too; the parity runs
    * themselves execute the queries normally, and the cut subtree is
    * materialized under whichever codegen mode is live at execution. */
  private lazy val nativeUsers: Seq[String] = {
    // membership by PACKAGE, not an enumerated class list: every engine
    // kernel lives in graft.engine.functions, so a newly added
    // expression joins the sweep the moment a query plans it — an
    // enumerated list silently excluded the round-13 kernel batch's
    // queries unless they also happened to plan an older expression
    SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val plan = SharedPlans.optimized(n)
      plan.collectWithSubqueries {
        case node if node.expressions.exists(_.exists(
          _.getClass.getName.startsWith("graft.engine.functions."))) => ()
      }.nonEmpty
    }
  }

  test("the sweep's scope detector finds the native-expression queries") {
    // if plan rewiring ever hides the expressions from the walk, the
    // sweep would silently shrink to nothing — pin known members,
    // including queries whose ONLY native expression is a round-13/14
    // kernel (the enumerated-list detector missed those)
    assert(nativeUsers.nonEmpty)
    Seq("data_zorder", "dedup_simhash", "text_tokens",
      "agg_hll", "text_langid_ngram", "dedup_near").foreach { expected =>
      assert(nativeUsers.contains(expected),
        s"$expected no longer detected as a native-expression query — " +
          s"detector or query changed; sweep scope: $nativeUsers")
    }
  }

  test("every native-expression query returns identical rows with " +
    "codegen hard-disabled (interpreted parity)") {
    val diffs = SparkTest.confLock.synchronized {
      // FORCE the baseline under the default conf BEFORE mutating it
      // (the LayoutInvarianceSpec vacuity lesson)
      val baseline: Map[String, Seq[String]] = nativeUsers.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
      }.toMap
      val saved = (spark.conf.get(WholeStageKey), spark.conf.get(FactoryKey))
      spark.conf.set(WholeStageKey, "false")
      spark.conf.set(FactoryKey, "NO_CODEGEN")
      try nativeUsers.filter { n =>
        val alt = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).toSeq
        alt != baseline(n)
      } finally {
        spark.conf.set(WholeStageKey, saved._1)
        spark.conf.set(FactoryKey, saved._2)
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries diverge between codegen and interpreted " +
        s"execution: ${diffs.mkString(", ")}")
  }

  test("graft_dot / graft_l2 ragged-input contract: fold to min length, " +
    "identically in both execution paths") {
    // Round-19 (verdict residual): VectorOps.dot/l2 fold ragged arrays
    // to the SHORTER length, where the declarative twin
    // aggregate(zip_with(...)) nulls out (zip_with pads with null).
    // Every engine call site is fixed-dimension so the divergence is
    // latent — this pins the documented contract so a future ragged
    // caller hits a failing test, not a silent wrong number, and
    // proves the two execution paths agree on it.
    import spark.implicits._
    def run(): (Double, Double, Boolean, Boolean) = {
      val r = spark.sql(
        """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(10.0D, 20.0D)) AS d,
          |       graft_l2(array(1.0D, 2.0D, 3.0D), array(10.0D, 20.0D)) AS l,
          |       aggregate(zip_with(array(1.0D, 2.0D, 3.0D),
          |                          array(10.0D, 20.0D), (x, y) -> x * y),
          |                 0.0D, (a, b) -> a + b) AS decl_d
          |FROM range(1)""".stripMargin).collect().head
      (r.getDouble(0), r.getDouble(1), r.isNullAt(2),
        // same-length sanity alongside: contract only bends on ragged
        spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(10.0D, 20.0D))" +
          " AS d FROM range(1)").collect().head.getDouble(0) == 50.0)
    }
    val (cg, interp) = SparkTest.confLock.synchronized {
      val a = run()
      val saved = (spark.conf.get(WholeStageKey), spark.conf.get(FactoryKey))
      spark.conf.set(WholeStageKey, "false")
      spark.conf.set(FactoryKey, "NO_CODEGEN")
      val b =
        try run()
        finally {
          spark.conf.set(WholeStageKey, saved._1)
          spark.conf.set(FactoryKey, saved._2)
        }
      (a, b)
    }
    for ((tag, r) <- Seq("codegen" -> cg, "interpreted" -> interp)) {
      assert(r._1 == 50.0, s"$tag: ragged graft_dot must fold to min " +
        s"length (1*10 + 2*20 = 50), got ${r._1}")
      assert(r._2 == 405.0, s"$tag: ragged graft_l2 must fold to min " +
        s"length ((1-10)^2 + (2-20)^2 = 405), got ${r._2}")
      assert(r._3, s"$tag: the declarative zip_with form must null out " +
        "on ragged inputs — if this changes, the documented divergence " +
        "in VectorOps is stale")
      assert(r._4, s"$tag: equal-length dot sanity failed")
    }
  }

  test("canary: a deliberately divergent expression makes the two modes " +
    "disagree (the conf flip really changes the execution path)") {
    import spark.implicits._
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_parity_canary",
      exprs => CodegenParityCanary(exprs.head), "built-in")
    def run(): Seq[Long] =
      spark.range(1, 4).selectExpr("graft_parity_canary(id) AS v")
        .as[Long].collect().toSeq.sorted
    val (cg, interp) = SparkTest.confLock.synchronized {
      val a = run() // default conf: whole-stage codegen → doGenCode path
      val saved = (spark.conf.get(WholeStageKey), spark.conf.get(FactoryKey))
      spark.conf.set(WholeStageKey, "false")
      spark.conf.set(FactoryKey, "NO_CODEGEN")
      val b =
        try run() // interpreted → nullSafeEval path
        finally {
          spark.conf.set(WholeStageKey, saved._1)
          spark.conf.set(FactoryKey, saved._2)
        }
      (a, b)
    }
    assert(cg == Seq(3L, 4L, 5L), s"codegen path returned $cg — the " +
      "default conf did not take the generated-code path")
    assert(interp == Seq(2L, 3L, 4L), s"interpreted path returned " +
      s"$interp — NO_CODEGEN did not force the eval path")
  }
}

/** Test-only: eval says x+1, codegen says x+2 — exists solely to prove
  * the parity sweep's conf flip switches execution paths. */
case class CodegenParityCanary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any): Any = x.asInstanceOf[Long] + 1L
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"($x + 2L)")
  override protected def withNewChildInternal(
      newChild: Expression): CodegenParityCanary = copy(child = newChild)
}
