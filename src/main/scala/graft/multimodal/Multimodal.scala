package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this environment): it derives deterministic fake features from the
  * bytes. The Spark-side plumbing — binary schema, digesting, batch
  * partitioning, typed mapPartitions signature — is real, and is what
  * carries over to a cluster: decode happens executor-side, one codec
  * init per partition, never on the driver.
  */
object Multimodal {

  /** Metadata extraction over a binary media column: size, digest,
    * deterministic batch assignment (the decode work unit). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("media")) // stand-in media payload
      .select(col("doc_id"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        sha2(col("media"), 256).as("digest"),
        (col("doc_id") % 32).as("batch_id"))
      .orderBy("doc_id")

  /** Exact media dedup by content digest: group binary payloads on
    * sha256, canonical = min doc_id per digest — the multimodal twin of
    * dedup_exact. At 100 TB the digest is computed in the scan
    * projection and the groupBy shuffles 32-byte digests, never the
    * payload bytes. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("digest")
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        sha2(col("text").cast("binary"), 256).as("digest"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy("doc_id")
  }

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      n_frames: Int, feat_sum_255: Long)
  final case class ResizedRow(doc_id: Long, width: Int, height: Int,
      target_w: Int, target_h: Int, scale: Double)
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_ts_ms: Long)

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (one codec/model init per partition, batch-local). The fake decode
    * derives dimensions/frame-count/features from the payload's sha256
    * (a deterministic function of the bytes, so tests reproduce AND the
    * DuckDB oracle can recompute it). The 8-slot stub "feature vector"
    * is emitted as its integer slot-sum — no array column in the output
    * (the verify compare requires sortable scalar columns). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // STUB: per-partition "codec init" — here the digest instance.
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          md.reset()
          val hex = md.digest(r.media).map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60-bit, ≥0
          val w = (64 + h % 192).toInt         // fake width
          val ht = (64 + (h >> 8) % 192).toInt // fake height
          val frames = (1 + (h >> 16) % 16).toInt
          var featSum = 0L                     // Σ of the 8 fake feature slots
          var j = 0
          while (j < 8) { featSum += (h >> (j * 7)) & 0xFF; j += 1 }
          DecodedRow(r.doc_id, w, ht, frames, featSum)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  final case class InferRow(doc_id: Long, emb_dim: Int, emb_checksum: Long)

  /** STUB batched inference: the GPU-serving shape — one "model load"
    * per partition, forward passes over FIXED-SIZE batches
    * (`grouped(batchSize)`), per-row embeddings out. The fake forward
    * pass derives a 16-slot embedding from the payload's sha256 and
    * emits its position-weighted checksum, so (a) the DuckDB oracle
    * recomputes it, and (b) the output is provably independent of
    * batch boundaries and partition layout — which is the CONTRACT of
    * batching (a real model's kernel must not leak batch context
    * across rows either; the spec pins batchSize-invariance). */
  def batchInfer(spark: SparkSession, dir: String, batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // STUB: per-partition "model load" — here the digest instance
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.grouped(batchSize).flatMap { batch =>
          // STUB: the batched "forward pass"
          batch.map { r =>
            md.reset()
            val hex = md.digest(r.media).map("%02x".format(_)).mkString
            val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
            val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
            var cs = 0L
            var i = 0
            while (i < 8) {
              cs += (i + 1) * ((h1 >> (i * 7)) & 127)
              cs += (i + 9) * ((h2 >> (i * 7)) & 127)
              i += 1
            }
            InferRow(r.doc_id, 16, cs)
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** STUB resize: computes the aspect-preserving scale plan for each
    * media item toward a 224×224 target (the tensor-pipeline contract);
    * a real deployment applies the scale with an image library in the
    * same partition-local pass. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, dir)
      .select(col("doc_id"), col("width"), col("height"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        val scale = math.min(224.0 / w, 224.0 / h)
        ResizedRow(id, w, h, math.round(w * scale).toInt,
          math.round(h * scale).toInt, scale)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** STUB frame sampling: emits one row per sampled frame (every other
    * frame, capped at 4) with a deterministic fake timestamp — the
    * explode shape a video pipeline hands to per-frame featurizers. */
  def sampleFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, dir)
      .select(col("doc_id"), col("n_frames"))
      .as[(Long, Int)]
      .flatMap { case (id, n) =>
        (0 until n by 2).take(4).map(i => FrameRow(id, i, i * 40L))
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** STUB scene-change detection — the video-pipeline shot segmentation
    * step: per-frame signatures compared consecutively, a cut declared
    * where the Hamming distance jumps. A real deployment computes frame
    * signatures from decoded pixels (pHash per frame); this container
    * cannot decode, so the deterministic fake plants the structure a
    * real video has — frames within a scene share a base signature
    * (≤ 1 flipped "noise" bit each), scene transitions rotate the base
    * (~30 bits apart) — and because the fake is closed-form bit
    * arithmetic over the payload's sha256, the DuckDB oracle recomputes
    * every signature, distance, and cut decision bit-for-bit.
    *
    * Plan shape: frame explode is linear (≤ 16 rows per doc), the
    * consecutive compare is ONE lag window and the scene numbering ONE
    * cumulative sum over the same per-doc ordering — a single keyed
    * exchange regardless of corpus size, the same shape as
    * sessionization. */
  def sceneChanges(spark: SparkSession, dir: String): DataFrame = {
    val Mask60 = (1L << 60) - 1
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val frames = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("CAST(conv(substr(sha2(CAST(text AS BINARY), 256), 1, 15), 16, 10) AS BIGINT)")
          .as("h1"))
      .withColumn("n_frames", expr("CAST(1 + (h1 >> 16) % 16 AS INT)"))
      .select(col("doc_id"), col("h1"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      // TRUTH scene structure (what the fake plants): a transition at
      // frame 0 and wherever two low bits of the shifted payload hash
      // are clear (P = 1/4)
      .withColumn("truth_cut",
        col("frame_idx") === 0 || expr("((h1 >> (frame_idx % 60)) & 3) = 0"))
      .withColumn("truth_scene",
        sum(when(col("truth_cut"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // signature: scene base = h1 rotated by 13·scene (overflow-safe
      // rotation — low bits lifted, never a 63-bit shift), noise = at
      // most one planted bit per frame
      .withColumn("r", expr("(truth_scene * 13) % 60"))
      .withColumn("base", expr(
        s"((h1 >> r) | ((h1 & ((CAST(1 AS BIGINT) << r) - 1)) << (60 - r))) & $Mask60"))
      .withColumn("sig", expr(
        s"""base ^ (CASE WHEN ((h1 >> ((frame_idx * 7) % 59)) & 1) = 1
           | THEN CAST(1 AS BIGINT) << CAST(((h1 >> frame_idx) + frame_idx) % 60 AS INT)
           | ELSE 0 END)""".stripMargin))
    frames
      .withColumn("prev_sig", lag("sig", 1).over(w))
      .withColumn("hamming_prev",
        expr("CAST(bit_count(sig ^ prev_sig) AS BIGINT)"))
      .withColumn("is_cut", col("frame_idx") === 0 || col("hamming_prev") > 8)
      .withColumn("scene_id",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "frame_idx", "hamming_prev", "is_cut", "scene_id")
      .orderBy("doc_id", "frame_idx")
  }

  /** Perceptual-hash near-duplicate detection for media: 60-bit pHash →
    * 4×15-bit chunk LSH → exact Hamming ≤ 3 verify — the image near-dup
    * operator (same banding machinery as dedup_simhash, over media
    * signatures). The pHash itself is the documented STUB (a real
    * pipeline computes it from decoded pixels; this container can't
    * decode, so a deterministic fake stands in: a multiplicative group
    * hash with per-item planted bit flips, giving the corpus genuine
    * 0–3-bit near-pairs). Because the fake is closed-form arithmetic,
    * the DuckDB oracle recomputes ALL-PAIRS Hamming ≤ 3 exactly — so
    * this is the one LSH operator whose pigeonhole recall contract
    * (≤ 3 errors leave one of 4 chunks clean ⇒ every qualifying pair
    * surfaces) is PROVEN against an oracle, not just spec-sampled.
    * Scale shape: candidates come from chunk-bucket joins (never
    * all-pairs — the oracle's O(n²) join is the sf-small verifier
    * only), dedup on bare ids precedes the verify. */
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val Mask60 = (1L << 60) - 1
    // STUB pHash: items in the same group of 25 share a base signature;
    // each member flips k = doc_id%5 bits at positions derived from its
    // id — near-dups with Hamming 0..~8 inside a group, random across
    val sigs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("base", expr(s"((doc_id div 25) * 2654435761) & ${Mask60}"))
      .withColumn("phash", expr(
        """base ^
          | (CASE WHEN doc_id % 5 >= 1 THEN shiftleft(1L, CAST((doc_id * 1) % 60 AS INT)) ELSE 0L END) ^
          | (CASE WHEN doc_id % 5 >= 2 THEN shiftleft(1L, CAST((doc_id * 2) % 60 AS INT)) ELSE 0L END) ^
          | (CASE WHEN doc_id % 5 >= 3 THEN shiftleft(1L, CAST((doc_id * 3) % 60 AS INT)) ELSE 0L END) ^
          | (CASE WHEN doc_id % 5 >= 4 THEN shiftleft(1L, CAST((doc_id * 4) % 60 AS INT)) ELSE 0L END)""".stripMargin))
      .select("doc_id", "phash")
    val chunked = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk_id"),
          shiftrightunsigned(col("phash"), j * 15)
            .bitwiseAND(lit(0x7FFFL)).as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("phash"),
        col("c.chunk_id").as("chunk_id"), col("c.chunk").as("chunk"))
    val l = chunked.toDF("a_id", "a_h", "chunk_id", "chunk")
    val r = chunked.toDF("b_id", "b_h", "chunk_id", "chunk")
    l.join(r, Seq("chunk_id", "chunk")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_h", "b_h").distinct()
      .withColumn("hamming", expr("CAST(bit_count(a_h ^ b_h) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }

  /** STUB shared encoder for cross-modal retrieval: a 16-slot integer
    * embedding (slots in [0,127]) derived from the payload's sha256 —
    * deterministic, so the DuckDB oracle recomputes it bit-for-bit.
    * A real deployment swaps in the CLIP-style image/text towers; the
    * retrieval plumbing around it is unchanged. */
  private[multimodal] def stubEmbed(md: java.security.MessageDigest,
      bytes: Array[Byte]): Seq[Long] = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    (0 until 8).map(i => (h1 >> (i * 7)) & 127) ++
      (0 until 8).map(i => (h2 >> (i * 7)) & 127)
  }

  final case class MediaEmbRow(doc_id: Long, emb: Seq[Long])

  /** Cross-modal retrieval: text prompts against a media corpus through
    * a SHARED embedding space — the CLIP-style serving join. The media
    * tower runs executor-side in the model-serving shape (one encoder
    * init per partition, embeddings out of the binary column); the
    * prompt side is a BOUNDED query set embedded on the driver and
    * broadcast, so the corpus is scanned exactly once whatever its
    * size, scoring integer dot products (exact, engine-portable) and
    * keeping top-3 per prompt. At 100 TB the corpus side would flow
    * through the ANN index family (LSH/IVF/IVFPQ all apply unchanged —
    * the embedding column is the interface); this operator pins the
    * exact-scan baseline the indexes are measured against. */
  def crossModalSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // one "encoder load" per partition (digest instance as the stub)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map(r => MediaEmbRow(r.doc_id, stubEmbed(md, r.media)))
      }
      .toDF("doc_id", "emb")
    val mdq = java.security.MessageDigest.getInstance("SHA-256")
    val prompts = Seq("transit delay report", "vehicle speed trace",
      "route schedule table")
    val q = prompts.map(p =>
        (p, stubEmbed(mdq, p.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      .toDF("query", "q_emb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query").orderBy(col("score").desc, col("doc_id"))
    media.join(broadcast(q))
      .withColumn("score", expr(
        "aggregate(zip_with(emb, q_emb, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("query", "rank", "doc_id", "score")
      .orderBy("query", "rank")
  }

  /** Media near-dup clustering: connected components over the pHash
    * chunk-LSH pair graph (`phashPairs`), every asset labeled —
    * singletons self-label — with cluster size and canonical flag.
    * This is the decision step a media pipeline executes after pair
    * detection: keep one rendition per cluster, route the rest to
    * dedup. Reuses the min-label/pointer-jumping CC loop (one
    * neighbor-min shuffle per round over O(near-dup nodes), driver
    * reads one convergence count per round); the recursive-CTE oracle
    * reproduces the full closure bit-for-bit, so the banding's ≤3-bit
    * recall guarantee extends to CLUSTER identity, not just pairs. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = phashPairs(spark, dir).select("a_id", "b_id")
    val labels = graft.text.TextOps.guardedComponents(pairs)
    val w = Window.partitionBy("cluster_id")
    graft.sources.Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }
}
