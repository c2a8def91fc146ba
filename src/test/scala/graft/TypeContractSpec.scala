package graft

/** In-suite half of the type contract (r8 verdict ask #8): every oracled
  * query's Spark result schema must match `tools/type_manifest.json` —
  * the committed column→type manifest DERIVED from the DuckDB oracle's
  * DESCRIBE types by `tools/gen_type_manifest.py`. A Spark-side type
  * drift (a dropped `.cast`, a `sum` widening) fails HERE, in `sbt
  * test`, before any driver run; the oracle-side direction (an oracle
  * edit shifting a DuckDB type without regenerating the manifest) fails
  * in `tools/check.py`'s manifest-freshness pass. Schema-only: building
  * the frame at sf0.001 is enough — values are the verify gate's job.
  */
class TypeContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val manifest: Map[String, Map[String, String]] = {
    val src = scala.io.Source.fromFile("tools/type_manifest.json", "UTF-8")
    val text = try src.mkString finally src.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(text).asInstanceOf[JObject].obj.map {
      case (q, JObject(cols)) =>
        q -> cols.map { case (c, v) =>
          c -> v.asInstanceOf[JString].s
        }.toMap
      case (q, other) =>
        fail(s"manifest entry $q is not an object: $other")
    }.toMap
  }

  test("manifest covers exactly the oracled queries") {
    val oracled = SparkEntry.oracleSql.keySet
    assert(manifest.keySet == oracled,
      s"manifest/oracle drift: only-manifest=${manifest.keySet -- oracled} " +
        s"only-oracle=${oracled -- manifest.keySet} — rerun " +
        "tools/gen_type_manifest.py")
  }

  test("every oracled query's Spark schema matches the manifest") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, declared) <- manifest.toSeq.sortBy(_._1)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // timestamp_ntz normalizes to timestamp: Spark's NTZ and DuckDB's
      // (timezone-less) TIMESTAMP are the same wall-clock value in the
      // parquet dumps the driver hashes — q04 is hash-green with the pair
      val got = df.schema.fields
        .map(f => f.name ->
          f.dataType.simpleString.replace("timestamp_ntz", "timestamp"))
        .toMap
      if (got != declared) {
        val only = (got.toSet diff declared.toSet) ++
          (declared.toSet diff got.toSet)
        bad += s"$name: spark=$got declared=$declared diff=$only"
      }
      CacheScope.releaseAll()
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }
}
