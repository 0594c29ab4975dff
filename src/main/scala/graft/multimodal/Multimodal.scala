package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * batched decode / feature-extract / resize / frame-sample operators.
  *
  * The container has no codec libraries, so the actual byte→pixels decode
  * is a STUB — `FakeCodec` below is a clearly-marked deterministic fake.
  * Everything around it is real and tested: the schema (binary payload +
  * metadata struct), the partition-batched execution shape
  * (`mapPartitions` over a typed Dataset — one iterator per partition, the
  * same batch contract a vectorized/Arrow UDF has), and the
  * partitioning/pruning behavior (metadata-only queries never touch the
  * payload column thanks to parquet column pruning).
  *
  * Scale notes: payloads dominate storage — real deployments put them in
  * their own parquet column (or object store with a pointer column) so
  * metadata scans stay cheap; per-partition batching amortizes codec
  * setup; `spark.sql.files.maxPartitionBytes` bounds decode memory.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  /** Decoded features per media item. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      brightness: Double, sampled_frames: Seq[Int])

  /** ======= STUB: deterministic fake codec (no real image/audio libs in
    * this container). Replace `decodeBrightness`/`sampleFrames` with real
    * codec calls in production; signatures and batching stay the same. */
  object FakeCodec {
    /** "Brightness" = mean byte value — stands in for decode+luma. */
    def decodeBrightness(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xFF).toDouble).sum / payload.length
    /** "Frame sampling" = every k-th byte as a frame id. */
    def sampleFrames(payload: Array[Byte], everyK: Int): Seq[Int] =
      payload.indices.by(everyK).map(i => payload(i) & 0xFF)
  }

  /** Derive a deterministic media table from `documents` (payload = UTF-8
    * bytes of the text standing in for an encoded image). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      // metadata derived from n_chars only — char-count semantics agree
      // across engines for any encoding (ascii()/length(text) would
      // diverge on multi-byte text: bytes vs code points)
      (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("n_chars") * 7, lit(480)) + 1).cast("int").as("height"),
      (pmod(col("n_chars"), lit(250)) + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Average-hash ("aHash") of a payload — the perceptual-hash shape
    * every image-dedup pipeline runs, computed over the stub codec's
    * byte view: 64 equal cells (the 8×8 downsample stand-in), bit j = 1
    * iff cell j's mean byte exceeds the whole-payload mean. The
    * comparison is exact integer cross-multiplication
    * (cellSum·n > totalSum·cellCount) — no division, so the oracle
    * replays it bit-for-bit. A real deployment swaps the byte view for
    * decoded luma; the hash/banding/join machinery is identical. */
  def aHash64(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < n) {
      val c = (i.toLong * 64 / n).toInt
      val v = (payload(i) & 0xFF).toLong
      cellSum(c) += v; cellCnt(c) += 1; tot += v; i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (cellCnt(j) > 0 && cellSum(j) * n > tot * cellCnt(j)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Batched decode/feature-extract: one codec context per partition,
    * iterator-in/iterator-out — the Scala-typed equivalent of a
    * vectorized (Arrow-batched) UDF. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real impl: initialize codec once per partition here)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          FakeCodec.decodeBrightness(m.payload),
          FakeCodec.sampleFrames(m.payload, everyK = 32))
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Metadata-only scan: payload column pruned at the parquet/plan level
    // — the query the pipeline runs constantly and must never pay decode
    // for. sha2 digest over the payload proves binary-column support;
    // exact DuckDB counterpart.
    "multimodal_meta" -> ((s, d) => {
      mediaTable(s, d).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          col("width"), col("height"), col("n_frames"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy(col("media_id"))
    }),

    // Batched decode path (stubbed codec). FakeCodec is pure byte math,
    // so this IS oracle-checked: DuckDB recomputes brightness = mean byte
    // of encode(text) and n_sampled = ceil(n/32) from hex(blob).
    "multimodal_decode" -> ((s, d) => {
      extractFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("brightness"), size(col("sampled_frames")).as("n_sampled"))
        .orderBy(col("media_id"))
    }),

    // Perceptual-hash near-dup over the media payloads — the image-dedup
    // operator (aHash → banded LSH buckets → exact hamming verify),
    // running on the stub codec's byte view so the WHOLE path is
    // deterministic and oracle-checked. Every 10th payload gets a
    // planted corrupted twin (every 97th byte bumped — the bit-rot /
    // re-encode stand-in, the dedup_embcos augmentation precedent):
    // a byte-level aHash tracks payload corruption, not TEXT
    // near-duplication (measured: text near-dup pairs sit at hamming
    // 15–35, indistinguishable from noise; the planted twins land ≤ 6
    // while the closest non-twin candidate is at 12). Scale shape
    // mirrors dedup_simhash: hash in the codec's mapPartitions
    // contract, candidates from a 4×16-bit band equi-join (never
    // all-pairs), the in-kernel hamming verify, distinct
    // pairs out.
    "multimodal_phash" -> ((s, d) => {
      import s.implicits._
      val m = mediaTable(s, d)
      val withMax = m.toDF()
        .crossJoin(broadcast(m.toDF().agg(max(col("media_id")).as("mx"))))
        .select(col("media_id"), col("payload"), col("mx"))
        .as[(Long, Array[Byte], Long)]
      val hashed = withMax.flatMap { case (id, p, mx) =>
        val twin = if (id % 10 == 0) {
          val q = p.clone()
          var i = 0
          while (i < q.length) {
            if (i % 97 == 0) q(i) = (((q(i) & 0xFF) + 1) & 0xFF).toByte
            i += 1
          }
          Seq((id + mx + 1, aHash64(q)))
        } else Nil
        (id, aHash64(p)) +: twin
      }.toDF("media_id", "h")
      // Grouped-postings per (band, key) bucket — the dedup_simhash
      // shape: ONE hash aggregation collects each bucket's (id, hash)
      // members into a sorted struct array (id_a < id_b by
      // construction), candidate pairs stream out of codegen'd
      // generators, and the hamming filter runs BEFORE the distinct
      // shuffle so only near-pairs move. Replaces the sort-heavy SMJ
      // self-join of the banded frame (two full sorts of n×4 rows plus
      // a shuffle of every same-bucket candidate) that made this the
      // 11× entry at the ×100 rehearsal. Candidates, filters, and
      // output are unchanged — the oracle replays the identical
      // 4×16-bit band predicate.
      val banded = hashed.select(col("media_id"), col("h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("h"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
        .select(col("media_id"), col("h"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val posts = banded.groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(struct(col("media_id"), col("h"))))
          .as("ms"))
        .filter(size(col("ms")) >= 2)
      // round 9: hamming verify inside the codegen'd pair kernel (the
      // dedup_simhash change) — buckets emit only near pairs
      posts
        .select(explode(graft.dedup.SignatureExprs
          .hammingPairs(col("ms"), 6)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
          col("p.dist").as("dist"))
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Frame-sample fan-out: explode sampled frames (the shape a
    // video→frame training pipeline produces: one row per kept frame),
    // then per-kind frame statistics. Oracle-checked (stub codec is
    // deterministic byte arithmetic DuckDB can mirror).
    "multimodal_frames" -> ((s, d) => {
      extractFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("kind"),
          posexplode(col("sampled_frames")).as(Seq("frame_no", "frame_val")))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_frames"),
          avg(col("frame_val")).as("mean_val"),
          max(col("frame_no")).as("max_frame_no"))
        .orderBy(col("kind"))
    }),
  )

  /** Shared oracle CTEs: per-document byte list of the UTF-8 payload,
    * recovered in pure SQL via hex(blob) → two hex digits per byte (no
    * blob-indexing extension needed; texts are non-empty at every SF). */
  private val byteCtes: String =
    """m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, kind, n,
      |    (strpos('0123456789ABCDEF', substr(hx, i*2-1, 1))-1)*16
      |  + (strpos('0123456789ABCDEF', substr(hx, i*2,   1))-1) AS byte, i
      |  FROM m, LATERAL (SELECT unnest(generate_series(1, n)) AS i))""".stripMargin

  def oracle: Map[String, String] = Map(
    // brightness = mean byte (FakeCodec.decodeBrightness); double sums of
    // byte values stay integral < 2^53, so CAST(sum AS DOUBLE)/n is
    // bit-identical to the JVM's sequential double sum. n_sampled =
    // |indices stepped by 32| = # of i with (i-1) % 32 = 0.
    "multimodal_decode" ->
      s"""WITH $byteCtes
         |SELECT doc_id AS media_id, kind, CAST(n AS INT) AS n_bytes,
         |  CAST(sum(byte) AS DOUBLE) / n AS brightness,
         |  CAST(count(CASE WHEN (i-1) % 32 = 0 THEN 1 END) AS INT) AS n_sampled
         |FROM b GROUP BY doc_id, kind, n
         |ORDER BY media_id""".stripMargin,
    // per-kind stats over the sampled frames; frame_no is the 0-based
    // position within each doc's sampled list (= (i-1)//32)
    "multimodal_frames" ->
      s"""WITH $byteCtes,
         |f AS (
         |  SELECT kind, CAST((i-1)//32 AS INT) AS frame_no, byte
         |  FROM b WHERE (i-1) % 32 = 0)
         |SELECT kind, CAST(count(1) AS BIGINT) AS n_frames,
         |  CAST(sum(byte) AS DOUBLE) / count(byte) AS mean_val,
         |  max(frame_no) AS max_frame_no
         |FROM f GROUP BY kind ORDER BY kind""".stripMargin,
    // identical augmentation (every-97th-byte twin for doc_id % 10 = 0),
    // identical cells ((i-1)·64 // n), identical integer cross-multiplied
    // bit rule, identical 16-bit bands, hamming over the full 0..63 grid
    // (absent cells are 0-bits on both sides)
    // sf10 note: `b` (the per-byte explode) feeds both ball branches and
    // `bits` feeds both sides of the hamming join — OracleSql.materialized
    // stops DuckDB re-running the explode per reference (death-by-disk
    // at sf10 otherwise)
    "multimodal_phash" -> graft.OracleSql.materialized(
      s"""WITH $byteCtes,
         |mx AS (SELECT max(doc_id) AS mx FROM documents),
         |ball AS (
         |  SELECT doc_id AS media_id, n, byte, i FROM b
         |  UNION ALL
         |  SELECT b.doc_id + mx.mx + 1, n,
         |    CASE WHEN (i-1) % 97 = 0 THEN (byte + 1) % 256 ELSE byte END, i
         |  FROM b CROSS JOIN mx WHERE b.doc_id % 10 = 0),
         |tot AS (SELECT media_id, CAST(sum(byte) AS BIGINT) AS ts,
         |          CAST(n AS BIGINT) AS n FROM ball GROUP BY media_id, n),
         |cells AS (
         |  SELECT media_id, CAST(((i-1)*64)//n AS INT) AS cell,
         |    CAST(sum(byte) AS BIGINT) AS cs, count(1) AS cc
         |  FROM ball GROUP BY 1, 2),
         |bits AS (
         |  SELECT c.media_id, c.cell,
         |    CASE WHEN c.cs * t.n > t.ts * c.cc THEN 1 ELSE 0 END AS bit
         |  FROM cells c JOIN tot t USING (media_id)),
         |bands AS (
         |  SELECT media_id, cell // 16 AS band,
         |    CAST(sum(bit * (1 << (cell % 16))) AS BIGINT) AS key
         |  FROM bits GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS ida, b.media_id AS idb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id),
         |g AS (SELECT unnest(generate_series(0, 63)) AS cell),
         |ham AS (
         |  SELECT c.ida, c.idb,
         |    CAST(sum(CASE WHEN coalesce(xa.bit, 0) <> coalesce(xb.bit, 0)
         |      THEN 1 ELSE 0 END) AS INT) AS dist
         |  FROM cand c CROSS JOIN g
         |  LEFT JOIN bits xa ON xa.media_id = c.ida AND xa.cell = g.cell
         |  LEFT JOIN bits xb ON xb.media_id = c.idb AND xb.cell = g.cell
         |  GROUP BY 1, 2)
         |SELECT ida AS id_a, idb AS id_b, dist FROM ham
         |WHERE dist <= 6 ORDER BY id_a, id_b""".stripMargin,
      "m", "b", "mx", "ball", "tot", "cells", "bits", "bands", "cand",
      "g", "ham"),
    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | width, height, n_frames,
        | sha256(text) AS digest
        |FROM (SELECT *,
        |   CAST((n_chars % 640) + 1 AS INT) AS width,
        |   CAST(((n_chars * 7) % 480) + 1 AS INT) AS height,
        |   CAST((n_chars % 250) + 1 AS INT) AS n_frames
        |  FROM documents)
        |ORDER BY media_id""".stripMargin,
  )

  /** Scale-form oracle for the sf10+ comparator only (see
    * `SparkEntry.oracleSqlScale`): identical augmentation / cells /
    * bit rule / 16-bit bands / candidate join, but the hamming readout
    * packs each media's 64 cell-bits into ONE 64-bit signature
    * (`sum(bit << cell)`, absent cells contribute 0 exactly as the
    * primary's `coalesce(bit, 0)`) so distance is a single
    * `bit_count(xor(...))` per candidate — a pure-algebra rewrite of
    * the primary's cand × 64-cell grid × two LEFT JOINs against
    * `bits`, which probes the join ~3.5·10⁹ times at sf10 (cand is
    * ~28M pairs there) and died spilling. Band presence is preserved
    * bit-for-bit: a (media, band) row exists iff `bits` has a cell in
    * that band, as in the primary's GROUP BY. */
  def scaleOracle: Map[String, String] = Map(
    "multimodal_phash" -> graft.OracleSql.materialized(
      s"""WITH $byteCtes,
         |mx AS (SELECT max(doc_id) AS mx FROM documents),
         |ball AS (
         |  SELECT doc_id AS media_id, n, byte, i FROM b
         |  UNION ALL
         |  SELECT b.doc_id + mx.mx + 1, n,
         |    CASE WHEN (i-1) % 97 = 0 THEN (byte + 1) % 256 ELSE byte END, i
         |  FROM b CROSS JOIN mx WHERE b.doc_id % 10 = 0),
         |tot AS (SELECT media_id, CAST(sum(byte) AS BIGINT) AS ts,
         |          CAST(n AS BIGINT) AS n FROM ball GROUP BY media_id, n),
         |cells AS (
         |  SELECT media_id, CAST(((i-1)*64)//n AS INT) AS cell,
         |    CAST(sum(byte) AS BIGINT) AS cs, count(1) AS cc
         |  FROM ball GROUP BY 1, 2),
         |bits AS (
         |  SELECT c.media_id, c.cell,
         |    CASE WHEN c.cs * t.n > t.ts * c.cc THEN 1 ELSE 0 END AS bit
         |  FROM cells c JOIN tot t USING (media_id)),
         |sigs AS (
         |  SELECT media_id,
         |    sum(CASE WHEN bit = 1
         |      THEN CAST(1 AS HUGEINT) << CAST(cell AS INT)
         |      ELSE CAST(0 AS HUGEINT) END) AS u,
         |    ${graft.dedup.XxhSql.toI64(
               "sum(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) << " +
               "CAST(cell AS INT) ELSE CAST(0 AS HUGEINT) END)")} AS sig64
         |  FROM bits GROUP BY media_id),
         |bands AS (
         |  SELECT s.media_id, CAST(p.band AS INT) AS band,
         |    CAST(s.u // (CAST(1 AS HUGEINT) << CAST(p.band * 16 AS INT))
         |      % 65536 AS BIGINT) AS key
         |  FROM sigs s JOIN (SELECT DISTINCT media_id, cell // 16 AS band
         |                    FROM bits) p USING (media_id)),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS ida, b.media_id AS idb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id),
         |ham AS (
         |  SELECT c.ida, c.idb,
         |    CAST(bit_count(xor(sa.sig64, sb.sig64)) AS INT) AS dist
         |  FROM cand c JOIN sigs sa ON sa.media_id = c.ida
         |              JOIN sigs sb ON sb.media_id = c.idb)
         |SELECT ida AS id_a, idb AS id_b, dist FROM ham
         |WHERE dist <= 6 ORDER BY id_a, id_b""".stripMargin,
      "m", "b", "mx", "ball", "tot", "cells", "bits", "sigs", "bands",
      "cand", "ham"),
  )
}
