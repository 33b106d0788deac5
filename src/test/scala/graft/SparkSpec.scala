package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GRAFT_TEST_ANSI=false sweeps the whole suite under NON-ANSI mode
    // (legacy semantics: NaN instead of DIVIDE_BY_ZERO, size(null)=-1);
    // unset, the suite runs under Spark 4's default posture (ANSI on).
    // Don't SET the conf when the env var is absent — pinning "false"
    // here once silently flipped the whole suite off the default and
    // re-exposed legacy-only behaviors the engine must also survive.
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val s = sys.env.get("GRAFT_TEST_ANSI")
      .fold(b)(v => b.config("spark.sql.ansi.enabled", v))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
