package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures q60's residual scale risk (VERDICT r8 item 1): the
  * star-edge rewrite makes every banding bucket's min-id doc a HUB, so
  * one pathological mega-dup bucket (boilerplate duplicated ~10^6
  * times at 100 TB) concentrates that many edges on ONE join key in
  * EVERY connected-components propagation round. Two skew sites:
  *
  *   1. `bandedStarEdges`' join-back of bucket hubs onto bucket
  *      members — the mega bucket's (band,x,y) key is hot;
  *   2. each `minLabel` round's `bidir JOIN labels ON b` — the hub id
  *      is hot (degree = bucket size).
  *
  * Both are shuffle equi-joins of a fat side against a 1-row-per-key
  * side — exactly the shape AQE's OptimizeSkewedJoin splits, PROVIDED
  * its size thresholds are scaled to the deployment (the defaults
  * need a 256 MB partition; a bench-scale mega bucket produces tens
  * of MB). This probe builds the fixture from SIGNATURES (n docs with
  * an identical MinHash signature → one bucket per band), runs the
  * real q60 path (bandedStarEdges → minLabelWithRounds), and prints
  * min-of-3 wall + rounds under (a) default thresholds — hot
  * partition NOT split — and (b) thresholds scaled to the fixture —
  * split — plus whether the propagation-round join's final adaptive
  * plan is actually marked `skew=true`. The broadcast regime is
  * forced OFF for the label join (at the 100 TB design point the
  * label table is billions of rows; letting the bench-scale labels
  * broadcast would measure the wrong plan).
  *
  * Usage: CcSkewProbe [megaBucketMembers] [backgroundPairs]
  *   (defaults 4,000,000 and 200,000)
  */
object CcSkewProbe {
  def main(args: Array[String]): Unit = {
    val members = args.headOption.map(_.toInt).getOrElse(4000000)
    val bg = if (args.length > 1) args(1).toInt else 200000
    val spark = graft.core.GraftSession.build("cc-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // Mega bucket: docs 0..members-1 share ONE signature, so both
    // bands hash them to a single bucket each and doc 0 is the hub.
    // Background: docs beyond that get per-pair signatures, so each
    // pair (2i, 2i+1) is its own 2-doc bucket — a realistic sea of
    // small components around the pathological one.
    val base = members.toLong + 10L
    val mega = spark.range(0, members).select(
      col("id").as("doc_id"),
      lit(111L).as("mh1"), lit(222L).as("mh2"),
      lit(333L).as("mh3"), lit(444L).as("mh4"))
    val pairs = spark.range(0, bg.toLong * 2).select(
      (col("id") + base).as("doc_id"),
      // identical within a pair, distinct across pairs
      (expr("id div 2") * 7 + 1000000L).as("mh1"),
      (expr("id div 2") * 13 + 2000000L).as("mh2"),
      (expr("id div 2") * 17 + 3000000L).as("mh3"),
      (expr("id div 2") * 19 + 4000000L).as("mh4"))
    val sigs = mega.union(pairs).localCheckpoint()
    val nodes = sigs.select(col("doc_id")).localCheckpoint()

    // force the shuffle-join regime for the label/hub joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def starEdges(): DataFrame = graft.SparkEntry.bandedStarEdges(sigs)

    def runOnce(): (Double, Double, Int) = {
      val t0 = System.nanoTime()
      val edges = starEdges().localCheckpoint()
      val tEdges = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (out, rounds) = graft.ops.ConnectedComponents.minLabelWithRounds(
        nodes, "doc_id", edges, "doc1", "doc2")
      val inHub = out.filter(col("component") === 0L).count()
      val tCc = (System.nanoTime() - t1) / 1e9
      assert(inHub == members.toLong,
        s"expected $members docs labeled with hub component 0, got $inHub")
      (tEdges, tCc, rounds)
    }

    def run(label: String): Unit = {
      val rs = Seq.fill(3)(runOnce())
      println(f"$label: star-edges min=${rs.map(_._1).min}%.2fs " +
        f"cc min=${rs.map(_._2).min}%.2fs rounds=${rs.head._3}")
    }

    println(s"fixture: mega-bucket members=$members background-pairs=$bg")
    run("default-skew-thresholds (hot partition unsplit)")

    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    run("tuned-skew-thresholds  (hot partition split)")

    // Plan check on ONE propagation round's join shape — collect()
    // drives this frame's own QueryExecution so the adaptive plan
    // finalizes (a separate count() would plan a fresh execution).
    val edges = starEdges().localCheckpoint()
    val e = edges.select(col("doc1").cast("long").as("a"), col("doc2").cast("long").as("b"))
    val bidir = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val labels = bidir.groupBy("a").agg(min("b").as("nbrMin"))
      .select(col("a").as("id"), least(col("a"), col("nbrMin")).as("component"))
      .localCheckpoint()
    val roundJoin = bidir
      .join(labels.select(col("id").as("b"), col("component").as("bcomp")), "b")
      .groupBy("a").agg(min("bcomp").as("nbrMin"))
    roundJoin.queryExecution.toRdd.foreach(_ => ())
    val plan = roundJoin.queryExecution.executedPlan.toString
    println("propagation-round join marked skew=true under tuned thresholds: " +
      plan.contains("skew=true"))
    spark.stop()
  }
}
