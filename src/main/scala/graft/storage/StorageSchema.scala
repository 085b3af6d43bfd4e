package graft.storage

import org.apache.spark.sql.types._

/** Update semantics for rows sharing a primary key, mirroring the
  * reference's per-table choice (reference: columnar_storage/src/config.rs:166-172).
  *
  *  - [[UpdateMode.Overwrite]]: last write (highest `__seq__`) wins
  *    (reference operator.rs:36-44, LastValueOperator).
  *  - [[UpdateMode.Append]]: binary/array value columns are concatenated in
  *    `__seq__` order; other value columns take the first row
  *    (reference operator.rs:46-111, BytesMergeOperator).
  */
sealed trait UpdateMode
object UpdateMode {
  case object Overwrite extends UpdateMode
  case object Append extends UpdateMode
}

/** Schema of a time-merge table: a user schema whose first `numPrimaryKeys`
  * columns form the sort/merge key, plus engine-internal builtin columns
  * appended at the end (reference: columnar_storage/src/types.rs:143-196).
  *
  * Builtins:
  *  - `__seq__` LongType — write sequence (= SST file id, monotonically
  *    increasing; reference storage.rs:205-206, sst.rs:39-46)
  *  - `__reserved__` LongType — reserved, always null
  *    (reference types.rs:35-41,176-180)
  */
final case class StorageSchema(
    userSchema: StructType,
    numPrimaryKeys: Int,
    updateMode: UpdateMode = UpdateMode.Overwrite) {
  require(numPrimaryKeys > 0 && numPrimaryKeys <= userSchema.length,
    s"numPrimaryKeys=$numPrimaryKeys out of range for ${userSchema.length} cols")
  // User columns must not shadow the engine builtins: fullSchema would carry
  // duplicate field names and the write path's withColumn(__seq__, …) would
  // silently REPLACE the user's column with the engine sequence.
  require(!userSchema.fieldNames.exists(StorageSchema.Builtins.contains),
    s"user schema must not contain reserved column names " +
      s"${StorageSchema.Builtins.mkString(", ")}")

  val primaryKeys: Seq[String] = userSchema.fieldNames.take(numPrimaryKeys).toSeq
  val valueColumns: Seq[String] = userSchema.fieldNames.drop(numPrimaryKeys).toSeq

  /** Full on-disk schema: user columns then builtins (types.rs:159-196). */
  val fullSchema: StructType = StructType(
    userSchema.fields ++ Array(
      StructField(StorageSchema.SeqCol, LongType, nullable = true),
      StructField(StorageSchema.ReservedCol, LongType, nullable = true)))

  /** Widen a user projection so the merge step always sees every primary key
    * plus `__seq__`; engine strips the extras after merging
    * (reference types.rs:202-216 fill_required_projections).
    * Returns (widened column names, user-facing column names).
    */
  def widenProjection(projection: Option[Seq[String]]): (Seq[String], Seq[String]) =
    projection match {
      case None => (fullSchema.fieldNames.dropRight(1).toSeq, userSchema.fieldNames.toSeq) // all user cols + __seq__
      case Some(cols) =>
        val widened = (cols ++ primaryKeys.filterNot(cols.contains) :+ StorageSchema.SeqCol).distinct
        (widened, cols)
    }

  /** Legal schema WIDENING from this schema to `to`: primary keys
    * identical (names, types, order, count), every existing user column
    * keeps its name and type in place, and new columns append AFTER the
    * existing ones as nullable values. This is exactly the evolution the
    * read path supports natively — a scan passes the widened schema to the
    * parquet reader, and columns absent from older SSTs come back null
    * (no rewrite, no migration job; the only evolution shape that stays
    * O(0) at 100 TB). Renames, drops, type changes, or pk changes need a
    * rewrite and are rejected. */
  def canEvolveTo(to: StorageSchema): Boolean =
    to.numPrimaryKeys == numPrimaryKeys &&
      to.updateMode == updateMode &&
      to.userSchema.length >= userSchema.length &&
      userSchema.fields.zip(to.userSchema.fields).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType
      } &&
      to.userSchema.fields.drop(userSchema.length).forall(_.nullable)
}

object StorageSchema {
  val SeqCol = "__seq__"
  val ReservedCol = "__reserved__"
  val Builtins: Seq[String] = Seq(SeqCol, ReservedCol)

  /** One-line JSON for manifest persistence ([[Manifest.writeSchemaJson]]):
    * the scalar fields first, the Spark `StructType.json` payload LAST so
    * [[fromJson]] can slice it without parsing nested JSON. */
  def toJson(s: StorageSchema): String = {
    val mode = s.updateMode match {
      case UpdateMode.Overwrite => "overwrite"
      case UpdateMode.Append => "append"
    }
    s"""{"numPrimaryKeys":${s.numPrimaryKeys},"updateMode":"$mode","userSchema":${s.userSchema.json}}"""
  }

  def fromJson(json: String): StorageSchema = {
    val npk = """"numPrimaryKeys":(\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad schema json: $json")).group(1).toInt
    val mode = """"updateMode":"(\w+)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad schema json: $json")).group(1) match {
      case "append" => UpdateMode.Append
      case "overwrite" => UpdateMode.Overwrite
      case o => sys.error(s"unknown updateMode: $o")
    }
    val key = """"userSchema":"""
    val i = json.indexOf(key)
    require(i >= 0 && json.endsWith("}"), s"bad schema json: $json")
    val st = DataType.fromJson(json.substring(i + key.length, json.length - 1))
      .asInstanceOf[StructType]
    StorageSchema(st, npk, mode)
  }
}
