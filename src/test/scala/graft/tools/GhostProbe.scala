package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduction probe for the sweep-4 falsification of
  * "components: label-prop and star-contraction match union-find"
  * (validation/r12_prop_sweeps/sweep_4.log, seed
  * B5eczG94xWB1NY3cojDJ1kBCGfCNtRXpCrk8ng3379N=): replays the ORIGINAL
  * failing edge list and the shrunk self-loop artifact directly, many
  * times, printing the three labelings — discriminates deterministic
  * logic bug vs state/flake, and isolates the self-loop contract gap
  * the shrinker surfaced. */
object GhostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ghost-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val original: List[(Long, Long)] = List(
      (3L, 11L), (4L, 10L), (2L, 5L), (6L, 9L), (0L, 6L), (5L, 9L),
      (2L, 11L), (7L, 4L), (10L, 4L), (4L, 8L), (3L, 7L), (7L, 8L),
      (9L, 0L), (1L, 10L), (9L, 5L))
    val selfLoop: List[(Long, Long)] = List((0L, 0L))

    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.groupBy(find).flatMap { case (_, ms) =>
        val mn = ms.min; ms.map(_ -> mn)
      }
    }

    def check(tag: String, edges: List[(Long, Long)], reps: Int): Unit = {
      val want = unionFind(edges)
      for (i <- 1 to reps) {
        val df = edges.toDF("ida", "idb")
        val got = try {
          Right(graft.operators.Dedup.components(df)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
        } catch { case t: Throwable => Left(t.toString) }
        val gotStar = try {
          val l = graft.operators.Dedup.componentsStar(df)
          val m = l.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          graft.util.Pins.release(l)
          Right(m)
        } catch { case t: Throwable => Left(t.toString) }
        val ok = got == Right(want) && gotStar == Right(want)
        println(s"PROBE $tag rep$i ok=$ok")
        if (!ok) {
          println(s"PROBE   want    = ${want.toSeq.sorted}")
          println(s"PROBE   got     = ${got.map(_.toSeq.sorted)}")
          println(s"PROBE   gotStar = ${gotStar.map(_.toSeq.sorted)}")
        }
      }
    }

    // inline replica of Dedup.components' loop with per-round logging:
    // discriminates broken convergence detection (sig never stabilizes,
    // loop runs toward maxRounds with a nesting plan) from a per-round
    // blowup
    def trace(edges: List[(Long, Long)], maxRounds: Int): Unit = {
      val df = edges.toDF("ida", "idb")
      val sym = df.select(col("ida").as("src"), col("idb").as("dst"))
        .union(df.select(col("idb").as("src"), col("ida").as("dst")))
        .persist()
      var comp = sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")).persist()
      def sig(d: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        d.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      var prevSig = sig(comp)
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxRounds) {
        rounds += 1
        val t0 = System.nanoTime()
        val nmin = sym
          .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("ncomp")).as("nmin"))
        val next = comp
          .join(nmin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
          .persist()
        val s = sig(next)
        val planNodes = next.queryExecution.logical.collect { case n => n }.size
        comp.unpersist()
        comp = next
        converged = s.compareTo(prevSig) == 0
        println(f"PROBE round=$rounds sig=$s prev=$prevSig conv=$converged " +
          f"planNodes=$planNodes wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        prevSig = s
      }
      sym.unpersist(); comp.unpersist()
    }
    // `trace` replays the PRE-FIX persist() loop — run only on request
    // (rounds past ~9 take minutes each; that IS the measured bug)
    if (args.contains("trace")) trace(original, maxRounds = 12)
    check("original15", original, reps = args.headOption.flatMap(_.toIntOption).getOrElse(3))
    check("selfloop", selfLoop, reps = 2)
    spark.stop()
  }
}
