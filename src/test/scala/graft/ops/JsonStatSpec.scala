package graft.ops

import org.apache.spark.sql.Row
import graft.SparkSpec

class JsonStatSpec extends SparkSpec {
  import spark.implicits._

  private val dims =
    Seq("OMRÅDE", "BILTYPE", "BRUG", "EJER", "DRIV", "ContentsCode", "Tid")

  test("P1/P2: BIL54 fixture flattens to one row per (time, value)") {
    val cube = Seq(JsonStatFixture.json).toDF("js")
    val out = JsonStat.flatten(cube, "js", dims).orderBy("Tid").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[String]("OMRÅDE") == "All Denmark")
    assert(r.getAs[String]("BILTYPE") == "Passenger cars")
    assert(r.getAs[String]("DRIV") == "Electricity")
    assert(r.getAs[String]("Tid") == "2024M10")
    assert(r.getAs[Long]("value") == 345001L)
    assert(r.getAs[String]("table_id") == "BIL54")
    assert(r.getAs[Int]("decimals") == 0)
    assert(out(1).getAs[String]("Tid") == "2024M11")
    assert(out(1).getAs[Long]("value") == 345678L)
  }

  test("row-major index arithmetic on a genuine 2x3 cube") {
    val json =
      """{"dataset": {"label": "t", "source": "s", "updated": "u",
        |  "extension": {"px": {"tableid": "T", "decimals": 1}},
        |  "dimension": {
        |    "A": {"category": {"label": {"a1": "A1", "a2": "A2"}}},
        |    "B": {"category": {"label": {"b1": "B1", "b2": "B2", "b3": "B3"}}}
        |  },
        |  "value": [1, 2, 3, 4, 5, 6]}}""".stripMargin
    val out = JsonStat.flatten(Seq(json).toDF("js"), "js", Seq("A", "B"))
      .orderBy("value")
      .select("A", "B", "value").as[(String, String, Long)].collect()
    // Row-major: A varies slowest.
    assert(out.toSeq == Seq(
      ("A1", "B1", 1L), ("A1", "B2", 2L), ("A1", "B3", 3L),
      ("A2", "B1", 4L), ("A2", "B2", 5L), ("A2", "B3", 6L)))
  }

  test("category.index order wins over label insertion order (object and array forms)") {
    // Same 2x3 cube, but the label objects are emitted OUT of index order —
    // A uses the {code: pos} index form, B the [code, ...] array form.
    // JSON-STAT defines coordinate order by category.index, so the flatten
    // must reorder instead of trusting label insertion order.
    val json =
      """{"dataset": {"label": "t", "source": "s", "updated": "u",
        |  "extension": {"px": {"tableid": "T", "decimals": 1}},
        |  "dimension": {
        |    "A": {"category": {"index": {"a2": 1, "a1": 0},
        |                       "label": {"a2": "A2", "a1": "A1"}}},
        |    "B": {"category": {"index": ["b1", "b2", "b3"],
        |                       "label": {"b3": "B3", "b1": "B1", "b2": "B2"}}}
        |  },
        |  "value": [1, 2, 3, 4, 5, 6]}}""".stripMargin
    val out = JsonStat.flatten(Seq(json).toDF("js"), "js", Seq("A", "B"))
      .orderBy("value")
      .select("A", "B", "value").as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("A1", "B1", 1L), ("A1", "B2", 2L), ("A1", "B3", 3L),
      ("A2", "B1", 4L), ("A2", "B2", 5L), ("A2", "B3", 6L)))
  }

  test("missing dimension yields null labels, rows preserved (P2 defaults)") {
    val json =
      """{"dataset": {"label": "t", "source": "s", "updated": "u",
        |  "extension": {"px": {"tableid": "T", "decimals": 0}},
        |  "dimension": {
        |    "Tid": {"category": {"label": {"2024M10": "2024M10", "2024M11": "2024M11"}}}
        |  },
        |  "value": [1, 2]}}""".stripMargin
    // OMRÅDE is absent from the document (reference statbank rows get
    // None via .get defaults, fetch_data_statbank.py:59-62).
    val out = JsonStat.flatten(Seq(json).toDF("js"), "js", Seq("OMRÅDE", "Tid"))
      .orderBy("value").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("OMRÅDE") == null))
    assert(out.map(_.getAs[String]("Tid")).toSeq == Seq("2024M10", "2024M11"))
  }

  test("P2 code fallback: 20225 preferred, 20200 fallback") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Map("20225" -> "Electricity"), Map("20200" -> "Diesel"))
    ).toDF("m1", "m2")
    val got = df.select(
      JsonStat.codeWithFallback(col("m1"), Seq("20225", "20200")).as("a"),
      JsonStat.codeWithFallback(col("m2"), Seq("20225", "20200")).as("b"))
      .as[(String, String)].head()
    assert(got == ("Electricity", "Diesel"))
  }
}
