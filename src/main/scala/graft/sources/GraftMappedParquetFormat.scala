package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] for COLUMN-MAPPED lake tables: the plan speaks
  * LOGICAL names, the parquet bytes carry PHYSICAL names (rename/drop
  * with no rewrite — `Export`'s `graft.physical` field metadata), and
  * this format is the one seam where the two meet. At reader-build time
  * it renames the requested schema and the pushed filters logical →
  * physical and delegates to the stock parquet reader; the rows that
  * come back are POSITIONAL (`InternalRow`/`ColumnarBatch` carry no
  * names), and the renamed request has the same field order and types
  * as the logical one — so the scan's output is byte-identical to what
  * the logical schema promises with ZERO per-row work. Vectorized
  * reads, row-group skipping on the physical column's stats, and
  * whole-stage codegen all survive, because nothing below the rename
  * can tell the table was ever renamed.
  *
  * A filter whose column has no physical translation needs none
  * (identity mapping); one whose SHAPE the renamer doesn't know is
  * DROPPED from the pushdown set — always safe, parquet pushdown is
  * advisory and Spark re-evaluates the full predicate above the scan.
  *
  * The mapping is captured at relation-build time (driver-side); the
  * reader function the superclass returns closes over only the renamed
  * schemas, so tasks ship nothing extra. */
final class GraftMappedParquetFormat(
    private val physOf: Map[String, String])
    extends ParquetFileFormat {

  private def rename(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(name = physOf.getOrElse(f.name, f.name))))

  private def renameFilter(f: Filter): Option[Filter] = {
    def n(c: String): String = physOf.getOrElse(c, c)
    f match {
      case EqualTo(c, v) => Some(EqualTo(n(c), v))
      case EqualNullSafe(c, v) => Some(EqualNullSafe(n(c), v))
      case GreaterThan(c, v) => Some(GreaterThan(n(c), v))
      case GreaterThanOrEqual(c, v) => Some(GreaterThanOrEqual(n(c), v))
      case LessThan(c, v) => Some(LessThan(n(c), v))
      case LessThanOrEqual(c, v) => Some(LessThanOrEqual(n(c), v))
      case In(c, vs) => Some(In(n(c), vs))
      case IsNull(c) => Some(IsNull(n(c)))
      case IsNotNull(c) => Some(IsNotNull(n(c)))
      case StringStartsWith(c, v) => Some(StringStartsWith(n(c), v))
      case StringEndsWith(c, v) => Some(StringEndsWith(n(c), v))
      case StringContains(c, v) => Some(StringContains(n(c), v))
      case And(l, r) => for (a <- renameFilter(l); b <- renameFilter(r))
        yield And(a, b)
      case Or(l, r) => for (a <- renameFilter(l); b <- renameFilter(r))
        yield Or(a, b)
      case Not(c) => renameFilter(c).map(Not)
      case AlwaysTrue() => Some(AlwaysTrue())
      case AlwaysFalse() => Some(AlwaysFalse())
      case _ => None // unknown shape: keep it out of the pushdown set
    }
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(sparkSession,
      rename(dataSchema), partitionSchema, rename(requiredSchema),
      filters.flatMap(renameFilter(_)), options, hadoopConf)

  // ParquetFileFormat.equals returns true for ANY ParquetFileFormat —
  // a mapped format must never compare equal to a plain one (or to a
  // format carrying a different mapping): relation/plan caching keyed
  // on the format would silently decode wrong column names. Identity =
  // class + mapping.
  override def equals(other: Any): Boolean = other match {
    case g: GraftMappedParquetFormat => g.physOf == physOf
    case _ => false
  }

  override def hashCode(): Int =
    31 * getClass.hashCode() + physOf.hashCode()

  override def toString: String = "GraftMappedParquet"
}
