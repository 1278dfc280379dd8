package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Scale probe for the r13 keyed-signature ingest modalities (Test
  * scope only): does audio-fingerprint / video-frame-hash dedup'd
  * ingest scale in the BATCH, not the corpus? Synthesizes per-id
  * assets with a fixed 20% duplicate density (recording seed =
  * id % 0.8N, containers rotated WAV/FLAC/mu-law so cross-container
  * dups exercise the decode-once discipline; videos get trimmed and
  * reordered variants), ingests two batches (60% then 40%), and
  * times each. The design claim: batch 2's cost tracks batch 2's
  * size + the banded index join — never corpus re-decode, never
  * corpus x corpus.
  * Run: sbt "Test/runMain graft.IngestScaleProbeMain [N ...]". */
object IngestScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(5000, 50000)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // splitmix64 finalizer: a LINEAR seed term before a mod keeps only
    // seed mod m (the first probe draft collapsed 40k recordings into
    // 4k this way); full-avalanche mixing makes every (seed, pos)
    // independent
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    for (n <- sizes) {
      val distinct = math.max(1, (n * 0.8).toInt) // 20% dup density
      // ---- audio: 129 windows x 16 samples, energy-delta-decisive
      val audio = spark.range(n.toLong).mapPartitions { it =>
        it.map { id =>
          val seed = id % distinct
          // mixed per-(recording, window) amplitudes: adjacent window
          // energy deltas are pseudo-random per recording, so the 128
          // fingerprint bits are distinct across recordings
          val clip = Array.tabulate(129 * 16) { t =>
            val w = t / 16
            val amp = 1000 + (mix(seed * 131L + w) & 0xFFF)
            (((t * 37 + seed * 11) % 200 - 100) * amp / 100).toShort
          }
          val bytes = (id % 3) match {
            case 0 => _root_.graft.ops.PixelCodec.encodeWav(clip, 8000)
            case 1 => _root_.graft.ops.FlacCodec.encode(clip, 8000, 1)
            case _ => _root_.graft.ops.PixelCodec.encodeWavUlaw(clip, 8000)
          }
          (id, bytes)
        }
      }.toDF("id", "payload").localCheckpoint(true) // synthesis off the clock
      val cut = (n * 0.6).toInt
      val aStore = new _root_.graft.table.TableStore(spark,
        java.nio.file.Files.createTempDirectory(s"graft-ing-au-$n").toString)
      val (_, a1) = time(_root_.graft.api.Dedup.ingestAudioDeduped(aStore,
        "fp", audio.filter(col("id") < cut), col("id"), col("payload"),
        batchId = Some("b1")).count())
      val (_, a2) = time(_root_.graft.api.Dedup.ingestAudioDeduped(aStore,
        "fp", audio.filter(col("id") >= cut), col("id"), col("payload"),
        batchId = Some("b2")).count())
      val aKept = aStore.read("fp").count()
      println(f"[ingest] n=$n%6d audio  b1(60%%)=$a1%6.2f s " +
        f"b2(40%%)=$a2%6.2f s kept=$aKept")

      // ---- video: 8 distinct-gradient frames per recording; every
      // 7th duplicate arrives REORDERED (set-equality must still dup)
      val video = spark.range(n.toLong).mapPartitions { it =>
        it.map { id =>
          val seed = (id % distinct).toInt
          // mixed pixels (not gradients): constant-slope frames share
          // dHash sign patterns across seeds, collapsing the
          // frame-hash vocabulary and faking near-universal dups
          def frame(s: Int): _root_.graft.ops.PixelCodec.Image =
            _root_.graft.ops.PixelCodec.Image(12, 10, 1, Array.tabulate(120) { i =>
              (mix(s * 7919L + i) & 0xFF).toByte
            })
          val seeds0 = (0 until 8).map(k => seed * 8 + k)
          val seeds = if (id % 7 == 6) seeds0.reverse else seeds0
          (id, _root_.graft.ops.PixelCodec.encodeApng(seeds.map(frame)))
        }
      }.toDF("id", "payload").localCheckpoint(true)
      val vStore = new _root_.graft.table.TableStore(spark,
        java.nio.file.Files.createTempDirectory(s"graft-ing-vid-$n").toString)
      val (_, v1) = time(_root_.graft.api.Dedup.ingestVideosDeduped(vStore,
        "vh", video.filter(col("id") < cut), col("id"), col("payload"),
        batchId = Some("b1")).count())
      val (_, v2) = time(_root_.graft.api.Dedup.ingestVideosDeduped(vStore,
        "vh", video.filter(col("id") >= cut), col("id"), col("payload"),
        batchId = Some("b2")).count())
      val vKept = vStore.read("vh").count()
      println(f"[ingest] n=$n%6d video  b1(60%%)=$v1%6.2f s " +
        f"b2(40%%)=$v2%6.2f s kept=$vKept")
    }
    spark.stop()
  }
}
