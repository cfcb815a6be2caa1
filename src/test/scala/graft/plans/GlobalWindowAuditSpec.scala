package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Audit of every UNPARTITIONED window in main (VERDICT r18 item 4).
  *
  * A `Window.orderBy` / `Window.rowsBetween` / empty `Window.partitionBy()`
  * funnels its whole input through ONE partition — fine over an
  * aggregated/bounded frame (a histogram, a top-k table), a scale-killer
  * over a raw corpus. This spec enforces the repo convention: every such
  * site must carry a `GLOBAL-WINDOW:` marker comment within the 12 lines
  * above it, stating either `bounded — <why the frame is small>` or
  * `DELIBERATE <why a full-table window is the point>`. A new
  * unpartitioned window without a marker fails this spec, so the audit
  * can never silently rot.
  */
class GlobalWindowAuditSpec extends AnyFunSuite {

  private val mainRoot = java.nio.file.Paths.get("src/main/scala/graft")

  private def mainFiles(): Seq[java.nio.file.Path] = {
    val it = java.nio.file.Files.walk(mainRoot)
    try {
      val b = Seq.newBuilder[java.nio.file.Path]
      it.forEach(p => if (p.toString.endsWith(".scala")) b += p)
      b.result()
    } finally it.close()
  }

  private def isCodeLine(l: String): Boolean = {
    val t = l.trim
    t.nonEmpty && !t.startsWith("//") && !t.startsWith("*") &&
      !t.startsWith("/*") && !t.startsWith("import ")
  }

  /** (file, 1-based line) of every unpartitioned-window use site. */
  private def globalWindowSites(lines: Array[String]): Seq[Int] =
    lines.indices.flatMap { i =>
      val l = lines(i)
      if (!isCodeLine(l)) None
      else if (l.contains("Window.orderBy") ||
        l.contains("Window.rowsBetween") ||
        l.contains("Window.partitionBy()")) Some(i)
      else if (l.contains("expressions.Window") &&
        !(l.contains("partitionBy(") && !l.contains("partitionBy()")) && {
        // two-line chained form: `...expressions.Window` + `.orderBy(...)`
        val next = lines.drop(i + 1).find(_.trim.nonEmpty).map(_.trim)
        next.exists(n => n.startsWith(".orderBy") ||
          n.startsWith(".rowsBetween"))
      }) Some(i)
      else None
    }

  test("every unpartitioned window in main carries a GLOBAL-WINDOW marker") {
    val unmarked = Seq.newBuilder[String]
    var total = 0
    for (f <- mainFiles()) {
      val lines = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        .split("\n", -1)
      for (i <- globalWindowSites(lines)) {
        total += 1
        val window = lines.slice(math.max(0, i - 12), i + 1)
        if (!window.exists(_.contains("GLOBAL-WINDOW:")))
          unmarked += s"$f:${i + 1}: ${lines(i).trim.take(80)}"
      }
    }
    assert(total >= 16, // the audited r19 inventory; a drop means the
      // detector regressed, not that sites vanished
      s"site detector found only $total unpartitioned windows — " +
        "detection rules out of sync with the code?")
    val u = unmarked.result()
    assert(u.isEmpty,
      s"unpartitioned window(s) without a GLOBAL-WINDOW audit marker:\n" +
        u.mkString("\n"))
  }

  test("DELIBERATE full-table windows are exactly p21's audit-op pair") {
    var count = 0
    for (f <- mainFiles()) {
      val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      count += s.sliding("GLOBAL-WINDOW: DELIBERATE".length)
        .count(_ == "GLOBAL-WINDOW: DELIBERATE")
    }
    assert(count == 2,
      s"expected exactly 2 DELIBERATE full-table windows (p21 wLin/wZ), " +
        s"found $count — a new one needs the same documented justification")
  }

  test("representative bounded site: rocAuc's window input is the " +
    "per-score aggregate, not the raw frame (plan-verified)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = Seq((1L, true), (2L, false), (2L, true), (3L, false))
        .toDF("score", "label")
      val out = graft.operators.EvalMetrics.rocAuc(df, col("score"), col("label"))
      val plan = out.queryExecution.optimizedPlan
      // find the Window node and assert an Aggregate sits beneath it
      val windows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.nonEmpty, "expected a Window node in rocAuc's plan")
      assert(windows.forall(_.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined),
        "rocAuc's global window must run over the per-score Aggregate:\n" +
          plan.treeString)
    } finally spark.stop()
  }
}
