package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class BucketingSpec extends SparkSpec {

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    // force execution so AQE finalizes the plan, then walk it
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: Exchange => e }.size
  }

  test("q08 materialized-base variant scans lineitem exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q08_base").toString
    val viaBase = Catalog.goldJoinFromMaterializedBase(
      spark, sf("sf0.001"), s"$tmp/base")
    // the three-sided join plan reads ONLY the materialized aggregate:
    // lineitem was scanned once, inside the materialize write job
    val scans = viaBase.queryExecution.executedPlan.toString()
    assert(!scans.contains("lineitem"),
      s"join plan must not rescan lineitem:\n$scans")
    // identical rows to the in-plan q08 shape
    val q08 = Catalog.entries.find(_.name == "q08_full_outer_nway").get
    val direct = q08.build(spark, sf("sf0.001"))
    assert(viaBase.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaBase).count() == 0)
    assert(direct.count() > 0)
  }

  test("same-bucketed tables join and aggregate with zero shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf("sf0.001"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val l = Tables.lineitem(spark, sf("sf0.001"))
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      Bucketing.writeBucketed(o, "b_orders", Seq("o_orderkey"), 4)
      Bucketing.writeBucketed(l, "b_lineitem", Seq("o_orderkey"), 4)

      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      assert(countExchanges(joined) == 0, "bucketed join must not shuffle")

      // groupBy on the bucket key rides the same distribution
      val agg = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
          Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      assert(countExchanges(agg) == 0, "groupBy on bucket key must not shuffle")

      // result parity with the plain join
      val plain = o.join(l, Seq("o_orderkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
