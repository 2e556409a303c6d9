package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generalized JSON-STAT cube flatten (reference P1/P2).
  *
  * The reference hardcodes the dimension names per table and zips only the
  * time dimension against the value array
  * (reference producers/statbank/fetch_data_statbank.py:44-89, zip at :86,
  * dimension extraction with defaults at :49-66). This operator generalizes
  * to an arbitrary dimension list: JSON-STAT stores `value` as a row-major
  * flattening of the dimension cross-product, so for value index v and
  * dimensions d_0..d_{n-1} with sizes s_0..s_{n-1}, the coordinate of d_j is
  * `(v / prod(s_{j+1..})) % s_j`.
  *
  * Pure column expressions (from_json + posexplode + index arithmetic) —
  * no UDF, whole-stage-codegen friendly, and the explode parallelizes over
  * however many cube documents arrive.
  */
object JsonStat {
  private val labelMap = MapType(StringType, StringType)

  /** Flatten a DataFrame with a JSON-STAT document string column `jsonCol`
    * into one row per value: one label column per dimension (named after
    * the dimension), `value`, and metadata columns `label`, `source`,
    * `updated`, `table_id`, `decimals`.
    *
    * @param dims dimension names in the cube's declared (row-major) order.
    */
  def flatten(df: DataFrame, jsonCol: String, dims: Seq[String]): DataFrame = {
    val js = col(jsonCol)
    def dimLabels(d: String): Column =
      from_json(get_json_object(js, s"$$.dataset.dimension.$d.category.label"), labelMap)

    // JSON-STAT defines a category's position via category.index (object
    // {code: pos} or array [code, ...]) — NOT via the insertion order of the
    // category.label object, which real cubes are free to emit in any order.
    // Build the label array in index order when an index is present; fall
    // back to label insertion order only when it is absent (the spec allows
    // omitting index for single-category dimensions).
    def orderedLabels(d: String, labels: Column): Column = {
      val idxObj = from_json(
        get_json_object(js, s"$$.dataset.dimension.$d.category.index"),
        MapType(StringType, LongType))
      val idxArr = from_json(
        get_json_object(js, s"$$.dataset.dimension.$d.category.index"),
        ArrayType(StringType))
      // Object form: sort (pos, code) entries by pos, then look each code up
      // in the label map. array_sort on structs orders by the first field.
      val byObj = transform(
        array_sort(transform(map_entries(idxObj),
          e => struct(e.getField("value").as("i"), e.getField("key").as("c")))),
        s => element_at(labels, s.getField("c")))
      val byArr = transform(idxArr, c => element_at(labels, c))
      when(idxObj.isNotNull, byObj)
        .when(idxArr.isNotNull, byArr)
        .otherwise(map_values(labels))
    }

    val withDims = dims.foldLeft(df) { (acc, d) =>
      acc.withColumn(s"__lbl_$d", orderedLabels(d, dimLabels(d)))
        .withColumn(s"__sz_$d", size(col(s"__lbl_$d")))
    }
    // Row-major divisors, built right-to-left: div_last = 1,
    // div_j = div_{j+1} * size_{j+1}.
    val withDivs = dims.zipWithIndex.reverse.foldLeft(withDims) {
      case (acc, (d, i)) =>
        if (i == dims.length - 1) acc.withColumn(s"__div_$d", lit(1L))
        else {
          val next = dims(i + 1)
          acc.withColumn(s"__div_$d",
            col(s"__div_$next") * col(s"__sz_$next"))
        }
    }
    val values = from_json(get_json_object(js, "$.dataset.value"),
      ArrayType(LongType))
    val exploded = withDivs
      .withColumn("__vals", values)
      .select(col("*"), posexplode(col("__vals")).as(Seq("__pos", "value")))

    val dimCols = dims.map { d =>
      val idx = (col("__pos") / col(s"__div_$d")).cast("long") % col(s"__sz_$d")
      element_at(col(s"__lbl_$d"), (idx + 1).cast("int")).as(d)
    }
    val metaCols = Seq(
      get_json_object(js, "$.dataset.label").as("label"),
      get_json_object(js, "$.dataset.source").as("source"),
      get_json_object(js, "$.dataset.updated").as("updated"),
      get_json_object(js, "$.dataset.extension.px.tableid").as("table_id"),
      get_json_object(js, "$.dataset.extension.px.decimals").cast("int").as("decimals"))
    exploded.select(dimCols ++ Seq(col("value")) ++ metaCols: _*)
  }

  /** P2 two-code fallback: the reference looks up `DRIV` code 20225 and
    * falls back to 20200 (fetch_data_statbank.py:63). General form: first
    * non-null among several map lookups. */
  def codeWithFallback(labels: Column, codes: Seq[String]): Column =
    coalesce(codes.map(c => element_at(labels, c)): _*)
}
