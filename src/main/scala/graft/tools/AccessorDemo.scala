package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Syntax._

/** Dev-only demo: the `.pp` accessor driven over real testdata —
  * runnable documentation for the README examples. */
object AccessorDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    println("== df.pp.mean() ==")
    li.select("l_quantity", "l_extendedprice").pp.mean().show()
    println("== df.pp.describe(l_quantity) ==")
    li.pp.describe("l_quantity").orderBy("stat").show()
    println("== df.pp.agg(returnflag -> qty sum/mean/std) ==")
    li.pp.agg(Seq("l_returnflag"), Seq("l_quantity" -> Seq("sum", "mean", "std"))).show()
    println("== wide (MLlib) pearson matrix vs pairwise ==")
    graft.engine.Corr.pearsonLongWide(li,
      Seq("l_quantity", "l_extendedprice", "l_discount")).show()
    println("== df.pp.merge(customer, on=custkey, left) ==")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumnRenamed("o_custkey", "custkey")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumnRenamed("c_custkey", "custkey")
    println(s"rows = ${o.pp.merge(c, on = Seq("custkey"), how = "left").count()}")
    spark.stop()
  }
}
