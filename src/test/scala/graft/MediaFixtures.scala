package graft

import graft.multimodal.MediaCodec

/** Shared planted media fixtures for the near-dup specs. The streaming
  * twins assert parity against the BATCH operators over the SAME planted
  * rows, so the fixtures must be byte-identical across suites — one
  * definition, not copies. */
object MediaFixtures {

  /** 20 base PCM-WAV clips, each followed by a near-dup twin with six
    * samples nudged by one quantization step (low-byte xor 0x01) —
    * the audio analogue of the perturbed-raster fixture. Ids: base 2g,
    * twin 2g+1. */
  def plantedClips: Seq[(Long, Array[Byte])] =
    (0 until 20).flatMap { g =>
      val base = MediaCodec.encodeWav(1 + g % 2, 300 + g * 13, 8000, 5000L + g * 7919)
      val twin = base.clone()
      (0 until 6).foreach(j =>
        twin(44 + 2 * (j * 37 + g)) = (twin(44 + 2 * (j * 37 + g)) ^ 0x01).toByte)
      Seq((2L * g, base), (2L * g + 1, twin))
    }

  /** 20 base BMP rasters, each followed by a near-dup twin with three
    * raster bytes flipped. Ids: base 2g, twin 2g+1. */
  def plantedRasters: Seq[(Long, Array[Byte])] =
    (0 until 20).flatMap { g =>
      val base = MediaCodec.encodeBmp(32 + g % 5, 24 + g % 3, 1000L + g * 7)
      val twin = base.clone()
      Seq(0, 1, 2).foreach(j =>
        twin(54 + 31 * j + g) = (twin(54 + 31 * j + g) ^ 0x11).toByte)
      Seq((2L * g, base), (2L * g + 1, twin))
    }

  /** Frame-0 Y-plane offset of a Y4M payload (header line + the first
    * FRAME marker) — where the video twins' perturbations land. */
  def y4mFrame0(p: Array[Byte]): Int = p.indexOf('\n'.toByte) + 1 + 6

  /** 20 base Y4M clips (2–7 frames, so both sampling regimes occur; every
    * 5th mono), each followed by a near-dup twin with two frame-0 luma
    * bytes flipped — later slots stay byte-identical, so the aligned
    * verify sees max_hamming = the slot-0 distance. Ids: base 2g,
    * twin 2g+1. */
  def plantedVideos: Seq[(Long, Array[Byte])] =
    (0 until 20).flatMap { g =>
      val base = MediaCodec.encodeY4m(16 + g % 5, 12 + g % 3, 2 + g % 6,
        3000L + g * 101, mono = g % 5 == 0)
      val twin = base.clone()
      val y0 = y4mFrame0(base)
      Seq(0, 1).foreach(j =>
        twin(y0 + 17 * j + g) = (twin(y0 + 17 * j + g) ^ 0x11).toByte)
      Seq((2L * g, base), (2L * g + 1, twin))
    }
}
