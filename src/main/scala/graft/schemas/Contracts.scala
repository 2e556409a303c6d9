package graft.schemas

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's four Avro data contracts as Spark StructTypes, plus the
  * schema-enforced projection (P3) and type-widening (P8) operators.
  *
  * Field-for-field from the reference avro-schema directory (.avsc files):
  * - ConsumptionIndustry.avsc: 5 non-null fields (string x4, float).
  * - ProductionConsumptionSettlement.avsc: 28 fields, all ["null", T]
  *   unions with default null.
  * - Bil52.avsc / Bil54.avsc: statbank vehicle-stock contracts.
  * The ksqlDB view widens float -> DOUBLE (reference cluster/README.md:112);
  * our engine standardizes on DoubleType end-to-end via `widenFloats`.
  */
object Contracts {
  val consumptionIndustry: StructType = StructType(Seq(
    StructField("HourUTC", StringType, nullable = false),
    StructField("HourDK", StringType, nullable = false),
    StructField("MunicipalityNo", StringType, nullable = false),
    StructField("Branche", StringType, nullable = false),
    StructField("ConsumptionkWh", FloatType, nullable = false)))

  private def f(n: String) = StructField(n, FloatType, nullable = true)
  val productionConsumptionSettlement: StructType = StructType(
    Seq(StructField("HourUTC", StringType, nullable = true),
      StructField("HourDK", StringType, nullable = true),
      StructField("PriceArea", StringType, nullable = true)) ++
    Seq("CentralPowerMWh", "LocalPowerMWh", "CommercialPowerMWh",
      "LocalPowerSelfConMWh", "OffshoreWindLt100MW_MWh",
      "OffshoreWindGe100MW_MWh", "OnshoreWindLt50kW_MWh",
      "OnshoreWindGe50kW_MWh", "HydroPowerMWh", "SolarPowerLt10kW_MWh",
      "SolarPowerGe10Lt40kW_MWh", "SolarPowerGe40kW_MWh",
      "SolarPowerSelfConMWh", "UnknownProdMWh", "ExchangeNO_MWh",
      "ExchangeSE_MWh", "ExchangeGE_MWh", "ExchangeNL_MWh",
      "ExchangeGB_MWh", "ExchangeGreatBelt_MWh", "GrossConsumptionMWh",
      "GridLossTransmissionMWh", "GridLossInterconnectorsMWh",
      "GridLossDistributionMWh", "PowerToHeatMWh").map(f))

  val bil52: StructType = StructType(Seq(
    StructField("time", StringType, nullable = false),
    StructField("value", IntegerType, nullable = false),
    StructField("ownership", StringType, nullable = false),
    StructField("propellant", StringType, nullable = false),
    StructField("unit", StringType, nullable = false),
    StructField("label", StringType, nullable = false)))

  val bil54: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("type_of_vehicle", StringType, nullable = false),
    StructField("terms_of_use", StringType, nullable = false),
    StructField("propellant", StringType, nullable = false),
    StructField("content_label", StringType, nullable = true),
    StructField("unit", StringType, nullable = false),
    StructField("time", StringType, nullable = false),
    StructField("value", IntegerType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    // Bil54.avsc:60 annotates this string with timestamp-millis intent.
    StructField("updated", StringType, nullable = false),
    StructField("documentation", StringType, nullable = true),
    StructField("table_id", StringType, nullable = false),
    StructField("decimals", IntegerType, nullable = false)))

  /** P3: schema-enforced projection — select exactly the contract's fields,
    * cast to contract types. Missing columns fail analysis (the serializer
    * in the reference likewise raises on contract miss,
    * fetch_data_energinet.py:255-257). */
  def enforce(df: DataFrame, contract: StructType): DataFrame =
    df.select(contract.fields.map(fd => col(fd.name).cast(fd.dataType)).toIndexedSeq: _*)

  /** P8: widen all float columns to double (ksqlDB view parity). */
  def widenFloats(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map {
      case StructField(n, FloatType, _, _) => col(n).cast(DoubleType).as(n)
      case StructField(n, _, _, _)         => col(n)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
