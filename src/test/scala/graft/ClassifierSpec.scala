package graft

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("learns a separable vocabulary perfectly") {
    // two classes with disjoint vocabularies plus shared filler
    val train = ((1 to 30).map(i =>
      (i.toLong, "the fast cat purrs softly here", "feline")) ++
      (31 to 60).map(i =>
        (i.toLong, "the loyal dog barks loudly there", "canine")))
      .toDF("doc_id", "text", "lang")
    val test = Seq(
      (101L, "cat purrs", "feline"),
      (102L, "dog barks", "canine"),
      (103L, "softly purrs the cat", "feline"),
      (104L, "loudly barks the dog", "canine"))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayes(train, test, "doc_id", "text", "lang")
      .collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Boolean]("correct")),
      out.map(r => (r.getLong(0), r.getString(2))).mkString(", "))
  }

  test("unseen-vocabulary doc: the lighter smoothing penalty wins exactly") {
    // 9:1 class imbalance, test doc shares no token with training.
    // Hand computation in micro-nats: per unseen token the cost is
    // ln(1/(n_c+V)); big has n_c=180, small n_c=20, V=2, so
    //   big:   ln(0.9)  + 2·ln(1/182) = -0.105361 - 2·5.204007
    //   small: ln(0.1)  + 2·ln(1/22)  = -2.302585 - 2·3.091042
    // small's lighter unseen penalty beats big's prior — the classic
    // NB smoothing asymmetry, asserted exactly.
    val train = ((1 to 90).map(i => (i.toLong, "alpha beta", "big")) ++
      (91 to 100).map(i => (i.toLong, "alpha beta", "small")))
      .toDF("doc_id", "text", "lang")
    val test = Seq((200L, "zzz qqq", "big")).toDF("doc_id", "text", "lang")
    val r = Classifier.naiveBayes(train, test, "doc_id", "text", "lang")
      .collect().head
    assert(r.getAs[String]("pred") === "small")
    assert(!r.getAs[Boolean]("correct"))
    def micro(x: Double) = math.round(x * 1e6)
    val want = micro(math.log(0.1)) + 2 * micro(math.log(1.0 / 22))
    assert(r.getAs[Long]("score_micro") === want)
  }

  test("evaluatePerClass: hand-computed confusion matrix and ratios") {
    // truths: a,a,a,b,b,c — preds: a,a,b,b,a,c
    // a: tp=2 fp=1 fn=1 -> P=6666 R=6666 F1=6666
    // b: tp=1 fp=1 fn=1 -> P=5000 R=5000 F1=5000
    // c: tp=1 fp=0 fn=0 -> P=R=F1=10000
    val pred = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "a"), ("c", "c")).toDF("truth", "pred")
    val out = Classifier.evaluatePerClass(pred, "truth", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out("a") === ((2L, 1L, 1L, 6666L, 6666L, 6666L)))
    assert(out("b") === ((1L, 1L, 1L, 5000L, 5000L, 5000L)))
    assert(out("c") === ((1L, 0L, 0L, 10000L, 10000L, 10000L)))
  }

  test("evaluatePerClass: never-predicted / never-true classes null " +
    "their undefined ratio") {
    // "x" is only ever a truth (never predicted): precision undefined;
    // "y" only ever predicted: recall undefined
    val pred = Seq(("x", "y")).toDF("truth", "pred")
    val rows = Classifier.evaluatePerClass(pred, "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("x").isNullAt(4) && rows("x").getLong(5) === 0L)
    assert(rows("y").getLong(4) === 0L && rows("y").isNullAt(5))
  }

  test("scores are exact micro-nat longs and deterministic across runs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run() = {
      val bucket = org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("doc_id").cast("string")
            .cast("binary")), 1, 2)
      Classifier.naiveBayes(docs.filter(bucket >= "40"),
        docs.filter(bucket < "40"), "doc_id", "text", "lang")
        .collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sortBy(_._1)
    }
    val a = run(); val b = run()
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }
}
