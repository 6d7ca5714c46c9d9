package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the Lsh text pipeline (r14 sf100 triage). */
object LsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    println("input partitions: " + docs.rdd.getNumPartitions)
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s   ($r)")
    }
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sh = docs.filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(
            slice(sequence(1, greatest(size(t) - 2, 1)), 1, greatest(size(t) - 2, 0)),
            i -> concat_ws(' ', slice(t, i, 3))))""").as("shingles"))
    t("shingles only")(sh.agg(sum(size(col("shingles")))).head().getLong(0))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(sh)
    t("shingles+TF")(vecs.select(sum(expr("size(shingles)"))).head().getLong(0))
    val cached = vecs.cache()
    t("cache fill (count)")(cached.count())
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = mh.fit(cached)
    t("minhash over cache")(model.transform(cached).agg(sum(size(col("hashes")))).head().getLong(0))
    t("probes TakeOrdered")(cached.orderBy(col("doc_id").asc).limit(256).count())
    spark.stop()
  }
}
