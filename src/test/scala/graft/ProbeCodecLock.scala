package graft

/** Scratch probe (library-boundary discipline, verify-skill §probes):
  * reproduce the MediaLab k=32 flatline OUTSIDE Spark — 32 plain
  * threads decoding PNG/WAV/GIF payloads — and self-sample thread
  * states to name the monitor that blocks 94% of task time
  * (MEDIALAB_r13_sf1.json: run 91.7 s vs cpu 5.3 s at k=32). */
object ProbeCodecLock {
  import graft.operators.Multimodal
  def main(args: Array[String]): Unit = {
    val nThreads = 32
    val perThread = 600
    // pre-encode payloads once, single-threaded
    val gifW = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val payloads = (0 until 90).map { i =>
      val id = i.toLong
      if (i % 3 == 0) {
        val w = 24 + (id % 48).toInt; val h = 24 + (id * 7 % 48).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        ("image", buf.toByteArray)
      } else if (i % 3 == 1) ("audio", Multimodal.wavBytes(id))
      else ("video", Multimodal.gifBytes(id, gifW))
    }
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var running = true
    val workers = (0 until nThreads).map { t =>
      val th = new Thread(() => {
        val gifR = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val audio = new Multimodal.AudioDecoder()
        var i = 0
        while (i < perThread) {
          val (kind, bytes) = payloads((t + i) % payloads.length)
          if (kind == "image") {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            require(img != null)
          } else if (kind == "audio") {
            val in = audio.decode(bytes)
            require(in.getFormat.getSampleRate > 0); in.close()
          } else {
            val r = Multimodal.gifDecode(bytes, gifR)
            require(r._1 > 0)
          }
          i += 1
        }
      }, s"probe-worker-$t")
      th.start(); th
    }
    val names = workers.map(_.getName).toSet
    val sampler = new Thread(() => {
      while (running) {
        val traces = Thread.getAllStackTraces
        traces.forEach { (th, st) =>
          if (names(th.getName) && st.nonEmpty) {
            val state = th.getState.toString
            if (state == "BLOCKED" || state == "WAITING" || state == "TIMED_WAITING") {
              val top = st.take(3).mkString(" <- ")
              hist.computeIfAbsent(s"$state @ $top",
                _ => new java.util.concurrent.atomic.AtomicLong(0)).incrementAndGet()
            }
          }
        }
        Thread.sleep(10)
      }
    })
    val t0 = System.nanoTime()
    sampler.start()
    workers.foreach(_.join())
    running = false
    sampler.join()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE decoded ${nThreads * perThread} payloads in $wall%.2f s with $nThreads threads")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2.get()).take(12).foreach { case (k, v) =>
      println(f"PROBE ${v.get()}%6d  $k")
    }
  }
}
