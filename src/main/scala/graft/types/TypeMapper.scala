package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL-family column metadata, as read from `information_schema.COLUMNS`
  * (reference: cmd/tablemeta.go:25-46, the `Table` struct).
  */
case class ColumnMeta(
    columnName: String,
    dataType: String,                       // lowercased MySQL type name
    characterMaximumLength: Option[Long],
    numericPrecision: Option[Int],
    numericScale: Option[Int],
    isNullable: String,                     // "YES" | "NO"
    columnDefault: Option[String],
    ordinalPosition: Int)

/** The reference's MySQL → PostgreSQL type mapping re-expressed three ways:
  * as a pure function (driver-side DDL emission), as a Spark Catalyst type
  * (the interchange representation every DataFrame uses), and as a Column
  * expression (so the mapping itself is a distributed, oracle-checkable
  * operator over a metadata DataFrame).
  *
  * Semantics per cmd/tablemeta.go:96-133 (type switch) and :76-94
  * (nullability/defaults). Flags per example.yml:15-16.
  */
object TypeMapper {

  /** PG type emitted for one column (cmd/tablemeta.go:96-133). */
  def toPgType(m: ColumnMeta, charInLength: Boolean = false,
               useNvarchar2: Boolean = false): String = m.dataType match {
    case "int" | "mediumint" | "tinyint" => "int"
    case "varchar" =>
      val n = m.characterMaximumLength.getOrElse(0L)
      if (useNvarchar2) s"nvarchar2($n)"
      else if (charInLength) s"varchar($n char)"
      else s"varchar($n)"
    case "char" =>
      val n = m.characterMaximumLength.getOrElse(0L)
      if (charInLength) s"char($n char)" else s"char($n)"
    case "text" | "tinytext" | "mediumtext" | "longtext" => "text"
    case "datetime" | "timestamp" => "timestamp"
    case "decimal" => (m.numericPrecision, m.numericScale) match {
      case (Some(p), Some(s)) => s"decimal($p,$s)"
      case (Some(p), None)    => s"decimal($p)"
      case _                  => "decimal"
    }
    case "double" | "float" => "double precision"
    case "tinyblob" | "blob" | "mediumblob" | "longblob" => "bytea"
    case other => other // passthrough verbatim (tablemeta.go:130-132)
  }

  /** Spark interchange type for one column (SURVEY §1.1 rightmost column). */
  def toSparkType(m: ColumnMeta): DataType = m.dataType match {
    case "int" | "mediumint" | "tinyint" => IntegerType
    case "bigint" => LongType
    case "varchar" | "char" | "text" | "tinytext" | "mediumtext" |
         "longtext" | "enum" | "set" | "json" => StringType
    case "datetime" | "timestamp" => TimestampType
    case "date" => DateType
    case "time" | "year" => StringType
    case "decimal" =>
      DecimalType(m.numericPrecision.getOrElse(10), m.numericScale.getOrElse(0))
    case "double" | "float" => DoubleType
    case "tinyblob" | "blob" | "mediumblob" | "longblob" | "bit" |
         "geometry" => BinaryType
    case _ => StringType
  }

  /** One column's DDL fragment: `"name" pgtype [default …] [not] null`
    * (cmd/tablemeta.go:76-94,135-138). */
  def columnDdl(m: ColumnMeta, charInLength: Boolean = false,
                useNvarchar2: Boolean = false): String = {
    val nullable = if (m.isNullable == "NO") "not null" else "null"
    val default = m.columnDefault match {
      case None => ""
      case Some(d) =>
        val quoted = m.dataType match {
          case "varchar" | "char" => s"'$d'"
          case _ if d == "( 'user' )" => "user" // tablemeta.go:89-90
          case _ => d
        }
        s" default $quoted"
    }
    s""""${m.columnName.toLowerCase}" ${toPgType(m, charInLength, useNvarchar2)}$default $nullable"""
  }

  /** Full CREATE TABLE statement (cmd/tablemeta.go:54,135-148).
    * `charInLength`/`useNvarchar2` are the reference's config-driven
    * character-length-unit switches (tablemeta.go:100-110). */
  def createTableDdl(table: String, cols: Seq[ColumnMeta],
                     charInLength: Boolean = false,
                     useNvarchar2: Boolean = false): String = {
    val body = cols.sortBy(_.ordinalPosition)
      .map(columnDdl(_, charInLength, useNvarchar2)).mkString(", ")
    s"""create table "${table.toLowerCase}" ($body)"""
  }

  /** The same type switch as a Column expression, so a whole
    * `information_schema.COLUMNS` DataFrame maps in one distributed pass
    * (no driver loop). Columns expected: data_type,
    * character_maximum_length, numeric_precision, numeric_scale.
    */
  def pgTypeExpr(dataType: Column, charMaxLen: Column,
                 numPrecision: Column, numScale: Column): Column = {
    when(dataType.isin("int", "mediumint", "tinyint"), lit("int"))
      .when(dataType === "varchar", concat(lit("varchar("), charMaxLen, lit(")")))
      .when(dataType === "char", concat(lit("char("), charMaxLen, lit(")")))
      .when(dataType.isin("text", "tinytext", "mediumtext", "longtext"), lit("text"))
      .when(dataType.isin("datetime", "timestamp"), lit("timestamp"))
      .when(dataType === "decimal",
        when(numScale.isNull, concat(lit("decimal("), numPrecision, lit(")")))
          .otherwise(concat(lit("decimal("), numPrecision, lit(","), numScale, lit(")"))))
      .when(dataType.isin("double", "float"), lit("double precision"))
      .when(dataType.isin("tinyblob", "blob", "mediumblob", "longblob"), lit("bytea"))
      .otherwise(dataType)
  }
}
