package graft.map

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.operators.Embedding
import graft.sources.Tables

/** x70 — document-size pre-flight audit: estimate the serialized size of
  * every root document a converted [[DocumentSchema]] would build,
  * WITHOUT building anything.
  *
  * Why this operator exists: the reference's target store rejects
  * documents over 16 MB (MongoDB's BSON document limit; the reference
  * serializes whole root arrays — server/WriteToFile.js:5-25 — so an
  * oversized root is a hard downstream failure), and the nested build
  * itself hits the same wall first: the measured 100× region tree
  * aggregates ~300 MB single-task rows and OOMs after 281 s (HEADROOM
  * r10, `q24_maproot_write`). Both failures are *discovered* only after
  * paying the full build. This audit computes the per-root byte estimate
  * with the build's own shuffle keys but none of its payload: each tree
  * level is a `groupBy(fk).agg(sum(bytes))` + one join carrying ONE long
  * per key where the build carries the entire child subtree — so the
  * pre-flight costs a small constant fraction of the build it guards and
  * cannot itself hit the wall (no `collect_list`, no array rows; gated
  * in DocSizeAuditSpec).
  *
  * Byte model ("estimated BSON bytes", constants documented inline):
  * BSON because the 16 MB limit is a BSON limit. Per document: 5 bytes
  * frame (int32 length + terminator). Per field: 2 + utf8(name) (type
  * byte + name cstring) plus a value cost of 0 for NULL, octet_length+5
  * for strings/binary (int32 length + bytes + NUL), 1 for booleans, 4
  * for int32/float32, 8 for int64/double/date/timestamp, 16 for
  * decimals. An embedded array of n child documents costs
  * 7 + utf8(arrayName) (element header + array frame) + Σ(4 + childDoc)
  * — 4 is a fixed per-element overhead (type byte + short index
  * cstring; exact BSON grows with index digit count, so estimates read
  * ~2–6 bytes/element low on million-element arrays — callers keep
  * headroom in the budget, and [[DocSizeAudit.MongoDocLimit]] already
  * sits at the hard ceiling). An EMPTY child array costs 0: the build
  * omits the key entirely (`Embedding.emptyToNull` + JSON-sink
  * omission, reference server/DBMigration.js:515-517).
  *
  * Scale shape: one aggregate + one join per tree edge, shuffling
  * (key, long) pairs; at 100 TB each level partitions by the same FK the
  * build would use, with map-side partial sums. The estimate is exact
  * under the model (no sampling), so the guard's decision is
  * deterministic.
  */
class DocSizeAudit(
    spark: SparkSession,
    sfDir: String,
    db: DatabaseMeta,
    loader: (SparkSession, String, String) => DataFrame = Tables.load) {

  import DocSizeAudit._

  private def load(table: String): DataFrame = loader(spark, sfDir, table)

  /** Per-document estimate for one root: the root table's primary-key
    * columns (original names, even for Referencing roots whose FK-PK
    * columns the build renames `_REF`) plus `est_doc_bytes`.
    */
  def estimateRoot(root: CollectionNode): DataFrame = {
    val meta = db(root.name)
    val fkCols = meta.foreignKeys.map(_.columnName).toSet
    val renamed = root.kind == ConversionKind.Referencing
    // mirror the build's field names: a Referencing root's FK columns
    // serialize as `c_REF` (4 extra name bytes each)
    val base =
      if (renamed) Embedding.renameFkRefs(load(root.name), meta.foreignKeys.map(_.columnName))
      else load(root.name)
    val annotated = annotate(base, root, excluded = Set.empty)
    val pkSelect = meta.primaryKeys.map { pk =>
      val c = if (renamed && fkCols.contains(pk)) pk + "_REF" else pk
      col(c).as(pk)
    }
    annotated.select(pkSelect :+ col(DocBytesCol).as("est_doc_bytes"): _*)
  }

  /** Largest estimated document of one root tree (0 for an empty root
    * table) — the scalar the budget guards compare.
    */
  def maxDocBytes(root: CollectionNode): Long = {
    val r = estimateRoot(root).agg(max(col("est_doc_bytes"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Whole-schema audit: one row per root collection —
    * (collection, n_docs, max_doc_bytes, n_over_budget).
    */
  def summary(schema: DocumentSchema, budgetBytes: Long = MongoDocLimit): DataFrame =
    schema.roots.map { r =>
      estimateRoot(r)
        .agg(
          count(lit(1)).as("n_docs"),
          coalesce(max(col("est_doc_bytes")), lit(0L)).as("max_doc_bytes"),
          coalesce(sum(when(col("est_doc_bytes") > budgetBytes, 1L).otherwise(0L)),
            lit(0L)).as("n_over_budget"))
        .select(lit(r.name).as("collection"), col("n_docs"),
          col("max_doc_bytes"), col("n_over_budget"))
    }.reduce(_ unionByName _)

  /** Add [[DocBytesCol]] = full per-row document bytes (own fields plus
    * all embedded subtrees). `excluded` names columns that are NOT part
    * of the document at this level (the group-by FK the build drops).
    * Same tree walk and FK resolution as [[DataMapper]] — the audit must
    * price exactly the document the mapper would build.
    */
  private def annotate(df: DataFrame, node: CollectionNode, excluded: Set[String]): DataFrame = {
    var cur = df
    val contribCols = node.embedded.zipWithIndex.map { case (child, i) =>
      val childMeta = db(child.name)
      val fkToParent = child.parentFkColumn
        .flatMap(c => childMeta.foreignKeys.find(_.columnName == c))
        .orElse(childMeta.foreignKeys.find(_.referencedTable == node.name))
        .getOrElse(throw new IllegalStateException(
          s"${child.name} embedded under ${node.name} without an FK to it"))
      var childDf = load(child.name)
      child.embeddedAttributesFrom.foreach { otherTable =>
        val fkToOther = childMeta.foreignKeys
          .find(fk => fk.referencedTable == otherTable && fk != fkToParent)
          .getOrElse(throw new IllegalStateException(
            s"${child.name}: no FK to two-way other parent $otherTable"))
        childDf = Embedding.joinOtherParent(
          childDf, fkToParent.columnName, fkToOther.columnName,
          load(otherTable), fkToOther.referencedColumn)
      }
      val groupCol =
        if (childDf.columns.contains(Embedding.ParentFkCol)) Embedding.ParentFkCol
        else fkToParent.columnName
      val childAnnotated = annotate(childDf, child, Set(groupCol))
      val contribName = s"__graft_contrib_$i"
      val contrib = childAnnotated
        .groupBy(col(groupCol).as("__graft_ck"))
        .agg((lit(7L + utf8Len(child.name)) +
          sum(lit(4L) + col(DocBytesCol))).as(contribName))
      cur = cur
        .join(contrib, cur(fkToParent.referencedColumn) === contrib("__graft_ck"), "left")
        .drop("__graft_ck")
      contribName
    }
    val ownCols = cur.schema.fields.filter(f =>
      !excluded.contains(f.name) && !f.name.startsWith("__graft_"))
    val own = ownCols.map(f => fieldBytes(f.name, f.dataType))
      .foldLeft(lit(5L): Column)(_ + _)
    val total = contribCols.foldLeft(own)((acc, c) => acc + coalesce(col(c), lit(0L)))
    cur.withColumn(DocBytesCol, total).drop(contribCols: _*)
  }

  /** One field's cost under the byte model (see class Scaladoc). */
  private def fieldBytes(name: String, dt: DataType): Column = {
    val nameCost = lit(2L + utf8Len(name))
    val valCost: Column = dt match {
      case StringType | BinaryType =>
        when(col(name).isNull, lit(0L))
          .otherwise(octet_length(col(name)).cast("long") + lit(5L))
      case BooleanType => when(col(name).isNull, lit(0L)).otherwise(lit(1L))
      case ByteType | ShortType | IntegerType | FloatType =>
        when(col(name).isNull, lit(0L)).otherwise(lit(4L))
      case LongType | DoubleType | TimestampType | TimestampNTZType | DateType =>
        when(col(name).isNull, lit(0L)).otherwise(lit(8L))
      case _: DecimalType => when(col(name).isNull, lit(0L)).otherwise(lit(16L))
      case other => throw new IllegalArgumentException(
        s"DocSizeAudit: unsupported source column type $other for column $name")
    }
    nameCost + valCost
  }
}

object DocSizeAudit {

  /** MongoDB's hard per-document BSON limit — the default budget. */
  val MongoDocLimit: Long = 16L * 1024 * 1024

  private[map] val DocBytesCol = "__graft_doc_bytes"

  private[map] def utf8Len(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
}
