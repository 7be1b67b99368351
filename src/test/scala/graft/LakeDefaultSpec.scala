package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column DEFAULT values — Delta's allowColumnDefaults with Iceberg's
  * initial-default read semantics, carried as standard Spark field
  * metadata inside the `#schema` line:
  *  - files PREDATING the column read the DEFAULT (per-file
  *    EXISTS_DEFAULT backfill in Spark's own parquet reader), not NULL;
  *  - batches OMITTING the column write the default physically
  *    (CURRENT_DEFAULT materialization at append);
  *  - batches SUPPLYING the column keep their values — an explicit
  *    NULL stays NULL;
  *  - the literal backing old files is FROZEN at ADD time; SET/DROP
  *    DEFAULT only changes what future omitting batches write. */
class LakeDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def requiresOf(root: String): Set[String] = {
    val v = Lake.currentVersion(spark, root).get
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, s"_commit_$v")), "UTF-8")
      .split("\n").find(_.startsWith("#require="))
      .map(_.stripPrefix("#require=").split(",").map(_.trim)
        .filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  }

  test("the EXISTS_DEFAULT reader contract: missing-from-file fills per file, stored values win") {
    // pins the Spark behavior the whole feature rides on — if an
    // upgrade ever drops it, THIS fails first with the clearest signal
    val dir = java.nio.file.Files.createTempDirectory("graft-defprobe")
    val oldDir = dir.resolve("old").toString
    val newDir = dir.resolve("new").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "t").write.parquet(oldDir)
    Seq((3L, "c", Some(9.9)), (4L, "d", Option.empty[Double]))
      .toDF("k", "t", "score").write.parquet(newDir)
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "CAST(0.5 AS DOUBLE)")
      .putString("CURRENT_DEFAULT", "CAST(0.5 AS DOUBLE)").build()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", StringType),
      StructField("score", DoubleType, nullable = true, md)))
    val out = spark.read.schema(schema).parquet(oldDir, newDir)
      .select("k", "score").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) === 0.5 && out(2L) === 0.5, "old files read the default")
    assert(out(3L) === 9.9, "new files read their value")
    assert(out(4L) === null, "explicit NULL stays NULL")
  }

  test("add-with-default chain: old files backfill, omitting appends materialize, supplying appends win, DROP lifts") {
    val root = tmpTable("graft-default-chain")
    // generation 1: no score column
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 8)
    val preDirs = Lake.resolve(spark, root).toSet
    // metadata-only add: zero data I/O, dirs untouched
    Lake.addColumnWithDefault(spark, root, "score", DoubleType, "0.5")
    assert(Lake.resolve(spark, root).toSet === preDirs)
    // the gate: a build without the feature would read these NULL
    assert(requiresOf(root)("default"))
    // generation-1 rows read the DEFAULT, not NULL
    assert(rows(Lake.readCommitted(spark, root).select("k", "score")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5)))
    // time travel BEFORE the add serves the old schema (no column)
    assert(!Lake.readCommittedAt(spark, root, 0L).columns.contains("score"))
    // an OMITTING append writes the default physically
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8)
    // a SUPPLYING append keeps its values — explicit NULL stays NULL
    Lake.commitAppend(
      Seq((4L, "d", Some(9.9)), (5L, "e", Option.empty[Double]))
        .toDF("k", "t", "score"),
      root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).select("k", "score")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5), Seq(3L, 0.5), Seq(4L, 9.9),
        Seq(5L, null)))
    // the omitting append's dir physically CARRIES the column (the
    // default materialized — it does not lean on the reader backfill)
    val newestPre = Lake.resolve(spark, root).toSet -- preDirs
    val physical = spark.read.parquet(newestPre.toSeq: _*)
    assert(physical.columns.contains("score"))
    // a COW rewrite (delete) preserves the semantics end-to-end
    Lake.deleteWhere(spark, root, col("k") === 2L, retain = 8,
      dvMaxRows = 0L)
    assert(rows(Lake.readCommitted(spark, root).select("k", "score")) ===
      Set(Seq(1L, 0.5), Seq(3L, 0.5), Seq(4L, 9.9), Seq(5L, null)))
    // DROP COLUMN lifts the default (and the gate, once no field
    // carries one)
    Lake.dropColumn(spark, root, "score")
    assert(!Lake.readCommitted(spark, root).columns.contains("score"))
    assert(!requiresOf(root)("default"))
  }

  test("SQL surface: ADD COLUMN ... DEFAULT, SET/DROP DEFAULT; refusals for non-constants and nested paths") {
    val root = tmpTable("graft-default-sql")
    Lake.commitOverwrite(
      Seq((1L, "x", 0.1)).toDF("id", "etype", "v")
        .select(col("id"), struct(col("etype"), col("v")).as("meta")),
      root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS defsql")
    spark.sql(s"CREATE TABLE defsql USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ALTER TABLE defsql ADD COLUMN score DOUBLE DEFAULT 0.5")
    assert(rows(spark.sql("SELECT id, score FROM defsql")) ===
      Set(Seq(1L, 0.5)))
    // INSERT omitting the column writes the default
    spark.sql("INSERT INTO defsql (id, meta) VALUES " +
      "(2, named_struct('etype', 'y', 'v', 0.2))")
    assert(rows(spark.sql("SELECT id, score FROM defsql")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5)))
    // SET DEFAULT changes FUTURE omitting writes only — the
    // generation-1 backfill stays at the frozen ADD-time literal
    spark.sql("ALTER TABLE defsql ALTER COLUMN score SET DEFAULT 7.0")
    spark.sql("INSERT INTO defsql (id, meta) VALUES " +
      "(3, named_struct('etype', 'z', 'v', 0.3))")
    assert(rows(spark.sql("SELECT id, score FROM defsql")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5), Seq(3L, 7.0)))
    // DROP DEFAULT: future omitting writes go back to NULL; history
    // (backfill AND materialized rows) is untouched
    spark.sql("ALTER TABLE defsql ALTER COLUMN score DROP DEFAULT")
    spark.sql("INSERT INTO defsql (id, meta) VALUES " +
      "(4, named_struct('etype', 'w', 'v', 0.4))")
    assert(rows(spark.sql("SELECT id, score FROM defsql")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5), Seq(3L, 7.0), Seq(4L, null)))
    // refusals: non-constant defaults, nested paths
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE defsql ADD COLUMN bad DOUBLE DEFAULT rand()")
    }.getMessage.contains("CONSTANT"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE defsql ADD COLUMN meta.x INT DEFAULT 1")
    }.getMessage.contains("top-level"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE defsql ALTER COLUMN meta.v SET DEFAULT 1.0")
    }.getMessage.contains("top-level"))
    spark.sql("DROP TABLE defsql")
  }

  test("defaults flow through MERGE INSERT, CHECK validation, schema evolution and the SQL relation") {
    val root = tmpTable("graft-default-flows")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.addColumnWithDefault(spark, root, "score", DoubleType, "0.5")
    // CHECK constraints validate the MATERIALIZED batch: a constraint
    // requiring non-NULL passes for an omitting batch (default fills)
    Lake.addCheckConstraint(spark, root, "score_nn", "score IS NOT NULL")
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).select("k", "score")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5)))
    // …and still refuses an EXPLICIT NULL
    intercept[IllegalArgumentException] {
      Lake.commitAppend(
        Seq((9L, "x", Option.empty[Double])).toDF("k", "t", "score"),
        root, retain = 8)
    }
    Lake.dropCheckConstraint(spark, root, "score_nn")
    // MERGE INSERT leaving the column unnamed takes the default
    spark.sql("DROP TABLE IF EXISTS defmerge")
    spark.sql(s"CREATE TABLE defmerge USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("MERGE INTO defmerge t USING (SELECT 3 AS k, 'c' AS t) s " +
      "ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k, t) VALUES (s.k, s.t)")
    assert(rows(spark.sql("SELECT k, score FROM defmerge WHERE k = 3")) ===
      Set(Seq(3L, 0.5)))
    // the SQL relation (catalog read path) serves the backfill too
    assert(rows(spark.sql("SELECT k, score FROM defmerge ORDER BY k")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5), Seq(3L, 0.5)))
    spark.sql("DROP TABLE defmerge")
  }

  test("defaults survive RENAME and lossless widening (field metadata rides the schema)") {
    val root = tmpTable("graft-default-ddl")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.addColumnWithDefault(spark, root, "n", IntegerType, "7")
    // rename: the default follows the column (metadata rides f.copy)
    Lake.renameColumn(spark, root, "n", "m")
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).select("k", "m")) ===
      Set(Seq(1L, 7), Seq(2L, 7)))
    // widen: the frozen literal recasts to the wider type at read
    Lake.alterColumnType(spark, root, "m", LongType)
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).select("k", "m")) ===
      Set(Seq(1L, 7L), Seq(2L, 7L), Seq(3L, 7L)))
    // drop lifts it with the column
    Lake.dropColumn(spark, root, "m")
    assert(!Lake.readCommitted(spark, root).columns.contains("m"))
  }

  test("the SQL DEFAULT keyword resolves through the synced catalog schema (INSERT and UPDATE)") {
    // Spark's own ResolveDefaultColumns substitutes the DEFAULT
    // keyword from CURRENT_DEFAULT field metadata on the catalog
    // schema — which syncCatalogSchema keeps aligned with the
    // manifest's; no engine-side special case needed, but the surface
    // is pinned here so a sync regression fails loudly
    val root = tmpTable("graft-default-kw")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.addColumnWithDefault(spark, root, "score", DoubleType, "0.5")
    spark.sql("DROP TABLE IF EXISTS defkw")
    spark.sql(s"CREATE TABLE defkw USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("INSERT INTO defkw VALUES (2, 'b', DEFAULT)")
    assert(rows(spark.sql("SELECT k, score FROM defkw")) ===
      Set(Seq(1L, 0.5), Seq(2L, 0.5)))
    spark.sql("UPDATE defkw SET score = 9.0 WHERE k = 2")
    spark.sql("UPDATE defkw SET score = DEFAULT WHERE k = 2")
    assert(rows(spark.sql("SELECT k, score FROM defkw WHERE k = 2")) ===
      Set(Seq(2L, 0.5)))
    spark.sql("DROP TABLE defkw")
  }

  test("the default feature gate refuses pre-default builds from committing on top") {
    // simulated old build: strip 'default' from the features it knows
    val root = tmpTable("graft-default-gate")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.addColumnWithDefault(spark, root, "score", DoubleType, "0.5")
    val v = Lake.currentVersion(spark, root).get
    // the stamped gate names the feature
    assert(requiresOf(root)("default"))
    // hand-edit the line to a feature THIS build doesn't know — the
    // same refusal an old build hits on 'default'
    val p = java.nio.file.Paths.get(root, s"_commit_$v")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("#require=default", "#require=default-v99")
    java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, s"._commit_$v.crc"))
    val e = intercept[UnsupportedOperationException] {
      Lake.readCommitted(spark, root).count()
    }
    assert(e.getMessage.contains("default-v99"))
  }

  test("query-time-anchored defaults refuse; constant expressions fold ONCE at DDL time") {
    val root = tmpTable("graft-default-fold")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    // current_timestamp()/current_date() are foldable AND
    // deterministic to Catalyst (folded only later, by
    // ComputeCurrentTime) — the node-level refusal is what stands
    // between them and a backfill that drifts per read
    assert(intercept[IllegalArgumentException] {
      Lake.addColumnWithDefault(spark, root, "ts", TimestampType,
        "current_timestamp()")
    }.getMessage.contains("anchored to query time"))
    assert(intercept[IllegalArgumentException] {
      Lake.addColumnWithDefault(spark, root, "d", DateType,
        "current_date()")
    }.getMessage.contains("anchored to query time"))
    assert(intercept[IllegalArgumentException] {
      Lake.alterColumnDefaults(spark, root, Seq("t" -> Some("now()")))
    }.getMessage.contains("anchored to query time"))
    // a constant EXPRESSION folds at DDL time: the stored metadata is
    // the folded literal's SQL, never the expression text — what the
    // per-file backfill and omitting writes re-evaluate is frozen
    Lake.addColumnWithDefault(spark, root, "n", IntegerType, "1 + 1")
    val f = Lake.readCommitted(spark, root).schema("n")
    assert(f.metadata.getString("CURRENT_DEFAULT") === "2")
    assert(f.metadata.getString("EXISTS_DEFAULT") === "2")
    assert(rows(Lake.readCommitted(spark, root).select("k", "n")) ===
      Set(Seq(1L, 2)))
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).select("k", "n")) ===
      Set(Seq(1L, 2), Seq(2L, 2)))
  }
}
