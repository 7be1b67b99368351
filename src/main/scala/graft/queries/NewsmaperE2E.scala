package graft.queries

import org.apache.spark.sql.functions._
import graft.newsmaper.Newsmaper
import graft.sources.Tables

/** The reference's own five-stage pipeline composition under the hard
  * oracle signal: extract-output → explodeDate → findCountry →
  * renameAndSelect → anti-join load, exactly the stage chain of
  * /root/reference/dags/Main.py:48-49 (Transform.py:36-89, Load.py:21-25).
  * The XML parse itself stays spec-side (NewsmaperSpec over the RSS
  * fixture — no SQL-expressible oracle for xpath); everything after the
  * extract output is replicated stage-for-stage in DuckDB.
  *
  * Articles are derived deterministically from the `documents` table so
  * the query scales with the SF like every other catalog entry (a
  * checked-in 10-row fixture would pin correctness but never exercise
  * the plan shape at bench scale):
  *   - title       = first 40 chars of text (may straddle a word — fine,
  *                   both engines cut the same chars)
  *   - description = full text
  *   - link        = unique URL carrying doc_id (the total-order sort key)
  *   - media       = NULL for every 4th doc (F7 NULL fallback), else a URL
  *   - id_source   = doc_id % 10 + 1 (ten feeds, like the reference's
  *                   sources.csv)
  *   - pubDate     = a ground-truth hour timestamp FORMATTED into the
  *                   three RFC-822 variants of Transform.py:50-58 by
  *                   doc_id % 3: numeric offset (+0200), tz name (GMT),
  *                   and 2-digit year. The Spark side must PARSE these
  *                   strings back ([[Newsmaper.parsePubDate]]'s fallback
  *                   chain); the oracle never parses — it constructs the
  *                   same instant arithmetically, so a parse bug on any
  *                   of the three formats breaks the hash match (and an
  *                   unparseable row trips the load guard's raise_error
  *                   rather than silently dropping).
  *
  * The calendar join is NOT assumed away: the oracle rebuilds the
  * hour-grain dimension with generate_series and joins on the same
  * (hours, day, month, year) tuple [[Newsmaper.explodeDate]] uses.
  * The anti-join base is the pipeline's own output for every 20th doc —
  * the "already loaded on a previous run" set — so J3's key semantics
  * (drop ANY row whose natural key is present, including fresh rows
  * that collide with a loaded one) are exercised, not just row identity.
  */
object NewsmaperE2E {

  /** references.json shape for the topic dictionary: one row per topic
    * with its keyword array, ids echoing the reference's sparse
    * country-id space (2, 3, 7, 44-51 — references.json:1-86; id 1 is
    * the unclassified default, Transform.py:14). */
  val topicIds: Seq[(String, Long)] = Seq(
    "relational" -> 2L, "streaming" -> 3L, "storage" -> 7L,
    "sorting" -> 44L, "perf" -> 45L)

  private val calStart = "2025-03-01 00:00:00"
  private val calEndExcl = "2025-03-11 00:00:00" // 240 hours, half-open

  private def dictValues: String =
    Text.topicDict.map { case (w, l) =>
      s"('$w', ${topicIds.toMap.apply(l)})"
    }.mkString(", ")

  val all: Seq[Q] = Seq(

    Q("q93_newsmaper_e2e",
      s"""WITH arts AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) AS title,
         |    'https://example.org/' || CAST(doc_id AS VARCHAR) AS link,
         |    text AS description,
         |    CASE WHEN doc_id % 4 = 0 THEN NULL
         |         ELSE 'https://cdn.example.org/' || CAST(doc_id AS VARCHAR) || '.jpg'
         |    END AS media,
         |    doc_id % 10 + 1 AS id_source,
         |    TIMESTAMP '$calStart' + (doc_id % 240) * INTERVAL 1 HOUR AS pub_ts
         |  FROM documents),
         |cal AS (
         |  SELECT CAST(date_diff('hour', TIMESTAMP '$calStart', h) AS BIGINT) AS id_date,
         |    hour(h) AS hours, day(h) AS day, month(h) AS month, year(h) AS year
         |  FROM (SELECT unnest(generate_series(TIMESTAMP '$calStart',
         |        TIMESTAMP '2025-03-10 23:00:00', INTERVAL 1 HOUR)) AS h)),
         |dated AS (
         |  SELECT a.*, c.id_date
         |  FROM arts a JOIN cal c
         |    ON hour(a.pub_ts) = c.hours AND day(a.pub_ts) = c.day
         |   AND month(a.pub_ts) = c.month AND year(a.pub_ts) = c.year),
         |ctext AS (SELECT doc_id, title || ' ' || description AS text FROM arts),
         |toks AS (SELECT doc_id, unnest(${Text.oTok}) AS tok FROM ctext),
         |dict(word, cid) AS (VALUES $dictValues),
         |votes AS (
         |  SELECT doc_id, cid, count(*) AS cnt
         |  FROM toks JOIN dict ON tok = word GROUP BY doc_id, cid),
         |top AS (
         |  SELECT doc_id, cid,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cid) AS rn
         |  FROM votes),
         |newsall AS (
         |  SELECT d.doc_id, CAST(coalesce(t.cid, 1) AS BIGINT) AS id_country,
         |    d.id_source, d.id_date, d.title, d.link, d.description, d.media
         |  FROM dated d LEFT JOIN top t ON d.doc_id = t.doc_id AND t.rn = 1),
         |base AS (SELECT id_source, id_date, title FROM newsall WHERE doc_id % 20 = 0)
         |SELECT id_country, id_source, id_date, title, link, description, media
         |FROM newsall n
         |WHERE NOT EXISTS (SELECT 1 FROM base b
         |  WHERE b.id_source = n.id_source AND b.id_date = n.id_date
         |    AND b.title = n.title)
         |ORDER BY link""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val arts = docs.select(
          col("doc_id"),
          substring(col("text"), 1, 40).as("title"),
          concat(lit("https://example.org/"), col("doc_id").cast("string")).as("link"),
          col("text").as("description"),
          when(col("doc_id") % 4 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("https://cdn.example.org/"),
              col("doc_id").cast("string"), lit(".jpg"))).as("media"),
          (col("doc_id") % 10 + 1).as("id_source"),
          expr(s"timestamp'$calStart' + (doc_id % 240) * interval 1 hour").as("__ts"))
        // the raw pubDate string the reference's extract would emit —
        // format chosen per doc so all three parse fallbacks run hot
        .withColumn("date",
          when(col("doc_id") % 3 === 0,
            concat(date_format(expr("__ts + interval 2 hour"),
              "EEE, dd MMM yyyy HH:mm:ss"), lit(" +0200")))
          .when(col("doc_id") % 3 === 1,
            concat(date_format(col("__ts"), "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT")))
          .otherwise(
            concat(date_format(col("__ts"), "dd MMM yy HH:mm:ss"), lit(" +0000"))))
        .drop("__ts")
      val dim = Newsmaper.calendarDim(s, calStart, calEndExcl)
      val refs = topicIds.map { case (label, id) =>
          (id, label, Text.topicDict.collect { case (w, l) if l == label => w })
        }.toDF("id", "name", "words")
      // referenced twice (incoming + the previously-loaded base); the
      // lazy checkpoint collapses the double compute of the transform
      // subtree (the semanticDedup precedent)
      val transformed = Newsmaper.findCountry(
        Newsmaper.explodeDate(arts, dim), refs).localCheckpoint(false)
      val base = Newsmaper.renameAndSelect(transformed.where(col("doc_id") % 20 === 0))
      Newsmaper.load(Newsmaper.renameAndSelect(transformed), base)
        .withColumn("id_date", col("id_date").cast("long"))
        .orderBy("link")
    })
}
