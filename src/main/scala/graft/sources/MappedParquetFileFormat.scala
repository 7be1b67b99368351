package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** Stock parquet reading under a COLUMN MAP: the whole plan — catalog
  * resolution, filter pushdown, manifest pruning, partition handling —
  * runs under the table's LOGICAL column names, and this format
  * translates the file-facing schemas and pushed-down filters to the
  * PHYSICAL names the immutable files actually store, at the last
  * boundary before the reader. Rows come back positionally (a rename
  * never moves or converts data), so the vectorized reader, codegen
  * and batch support are inherited untouched. This is the same
  * layering Delta Lake uses for its column-mapping 'name' mode
  * (DeltaParquetFileFormat over the stock reader).
  *
  * Filters whose shape the translator does not know are DROPPED, not
  * passed through: parquet pushdown is advisory (Spark re-applies the
  * full predicate above the scan), so dropping can only cost I/O,
  * never correctness — while passing an untranslated name through
  * would silently skip row groups that match. */
final class MappedParquetFileFormat(
    private[sources] val map: Map[String, String])
    extends ParquetFileFormat {

  private def phys(s: StructType): StructType = Lake.physSchema(s, map)

  /** Logical → physical attribute path — [[Lake.physName]]'s
    * longest-mapped-prefix rule (id-mode maps carry NESTED entries; a
    * pushed filter like `m.etype` translates every diverging segment
    * of its container chain, with an exact-name hit winning first so
    * a top-level column whose name happens to contain a dot still
    * maps as itself). */
  private def phys(c: String): String = Lake.physName(map, c)

  /** Translate one pushed filter to physical names. `neg` tracks
    * POLARITY: in positive position an AND may weaken per-conjunct
    * (dropping a side only widens the row-group set), but under an
    * odd number of NOTs the weakened subtree would come back
    * STRONGER — Not(a) skips row groups Not(And(a, b)) must keep —
    * so in negative position every child must translate whole or the
    * subtree drops. Currently every leaf shape below is total, so the
    * distinction is latent; it goes live the first time Spark grows a
    * filter shape this match does not know. */
  private[graft] def physFilter(f: sources.Filter,
      neg: Boolean = false): Option[sources.Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
    case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(phys(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(phys(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(phys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(phys(a), v))
    case sources.In(a, vs) => Some(sources.In(phys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
    case sources.StringStartsWith(a, v) =>
      Some(sources.StringStartsWith(phys(a), v))
    case sources.StringEndsWith(a, v) =>
      Some(sources.StringEndsWith(phys(a), v))
    case sources.StringContains(a, v) =>
      Some(sources.StringContains(phys(a), v))
    case sources.And(l, r) if neg => // negative position: whole or drop
      for (a <- physFilter(l, neg); b <- physFilter(r, neg))
        yield sources.And(a, b)
    case sources.And(l, r) => (physFilter(l, neg), physFilter(r, neg)) match {
      case (Some(a), Some(b)) => Some(sources.And(a, b))
      case (a, b)             => a.orElse(b) // AND weakens per-conjunct
    }
    case sources.Or(l, r) => for (a <- physFilter(l, neg); b <- physFilter(r, neg))
      yield sources.Or(a, b) // OR only survives whole
    case sources.Not(c) => physFilter(c, !neg).map(sources.Not(_))
    case sources.AlwaysTrue() | sources.AlwaysFalse() => Some(f)
    case _ => None // unknown shape: drop, never mistranslate
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[sources.Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(sparkSession, phys(dataSchema),
      partitionSchema, phys(requiredSchema), filters.flatMap(physFilter(_)),
      options, hadoopConf)

  // distinct maps must never compare equal (plan canonicalization /
  // exchange reuse compare relations structurally)
  override def equals(other: Any): Boolean = other match {
    case m: MappedParquetFileFormat => m.map == map
    case _ => false
  }
  override def hashCode(): Int = map.hashCode()
  override def toString: String = "Parquet(column-mapped)"
}
