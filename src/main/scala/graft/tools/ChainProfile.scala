package graft.tools

import graft.plug._
import org.apache.spark.sql.functions._
/** Profiles plug-rule-chain scaling: plan build / optimize / execute time
  * for 10-100 rule chains, with plug details and checkpoint staging. */
object ChainProfile {
  def main(a: Array[String]): Unit = {
    implicit val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def rules(n: Int) = (0 until n).toList.map(i =>
      PlugRule(s"r$i", "v1", s"l_quantity > ${i % 50}",
        Seq(PlugAction("l_returnflag", s"F$i"), PlugAction("l_linenumber", s"$i"))))
    def run(name: String, n: Int, build: SparkPlugBuilder => SparkPlugBuilder): Unit = {
      val t0 = System.nanoTime()
      val out = build(SparkPlug.builder).create().plug(li, rules(n)).toOption.get
      val tPlan = System.nanoTime()
      out.queryExecution.executedPlan // force analysis+optimization
      val tOpt = System.nanoTime()
      out.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val tExec = System.nanoTime()
      println(f"$name n=$n: build=${(tPlan-t0)/1e9}%.2f opt=${(tOpt-tPlan)/1e9}%.2f exec=${(tExec-tOpt)/1e9}%.2f s")
    }
    run("plain", 10, identity)
    run("plain", 50, identity)
    run("plain", 100, identity)
    run("plain+details", 50, _.enablePlugDetails())
    run("ckpt", 100, _.enableCheckpointing("/tmp/graft_ckpt", 25, 8))
    spark.stop()
  }
}
