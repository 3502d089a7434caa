package graft

import graft.kg.{KgModel, Train}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point for the TRAIN step of the lifecycle
  * (preprocess → train → predict, SURVEY.md §3.1):
  *
  *   spark-submit --class graft.TrainMain relation_extractionspark.jar \
  *     <webpagesPath> <fixturesDir> <goldPath> <outDir> [langs]
  *
  * Reads the dictionary + predicates from fixturesDir (weights there are
  * IGNORED — that is the point), distant-supervision-labels every candidate
  * against the gold KB at goldPath, fits the per-predicate logistic
  * regressions, and writes learned `weights.parquet` + `model_meta.parquet`
  * into outDir in the exact fixture schema — so a subsequent graft.Main run
  * can point its fixturesDir at a directory carrying the LEARNED model.
  */
object TrainMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: graft.TrainMain <webpagesPath> <fixturesDir> <goldPath> <outDir> [langs]")
    val Array(webpagesPath, fixturesDir, goldPath, outDir) = args.take(4)
    val langs = if (args.length > 4) args(4).split(',').toSeq else Seq("en")
    // the dictionary/predicates COPY below lazily reads fixturesDir while
    // overwriting outDir — same directory would overwrite the parquet mid-read
    require(new java.io.File(outDir).getCanonicalFile !=
        new java.io.File(fixturesDir).getCanonicalFile,
      s"outDir must differ from fixturesDir (got '$outDir'): the learned model " +
        "is written as a complete fixtures directory and would clobber its own input")

    val builder = SparkSession.builder()
      .appName("graft-kg-train")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    val spark = (if (sys.env.contains("SPARK_MASTER") || sys.props.contains("spark.master"))
      builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // dictionary + predicate signatures (existing weights deliberately unused)
    val dictModel = KgModel.load(spark, fixturesDir)
    val preds = dictModel.value.preds
    val gold = spark.read.parquet(goldPath)
    val webpages = spark.read.parquet(webpagesPath)

    val trained = Train.fromCorpus(spark, webpages, dictModel, preds, gold, langs)

    trained.weightRows.toDF("pred", "feature_id", "weight")
      .repartition(1).sortWithinPartitions("pred", "feature_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/weights.parquet")
    Seq((trained.tau, 0.0)).toDF("tau", "w")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/model_meta.parquet")
    // carry dictionary + predicates over so outDir is a COMPLETE fixturesDir
    // for graft.Main (predict step runs directly against the learned model)
    Seq("entity_dict", "predicates").foreach { t =>
      spark.read.parquet(s"$fixturesDir/$t.parquet").repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }

    trained.perPred.foreach { s =>
      val conv = if (s.finalObjective < 0) "no_fit"
        else if (s.nIter >= 60) "MAXITER_HIT (possibly unconverged)"
        else s"converged@${s.nIter}"
      println(
        s"[graft.TrainMain] ${s.pred}: candidates=${s.nCand} positives=${s.nPos} " +
          s"learned_weights=${s.nWeights} lbfgs=$conv objective=${s.finalObjective}")
    }
    println(s"[graft.TrainMain] wrote ${trained.weightRows.size} weight rows, " +
      s"tau=${trained.tau} -> $outDir")
    spark.stop()
  }
}
