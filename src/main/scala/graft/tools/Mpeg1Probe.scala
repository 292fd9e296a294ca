package graft.tools

/** Dev probe: hex-dump and decode a generated MPEG-1 I-only stream with
  * decoder exceptions made visible (-Dgraft.mpeg1.debug). */
object Mpeg1Probe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.mpeg1.debug", "1")
    val es = graft.ops.Mpeg1.encodeIntra(Seq(0xFF0000), 16, 16)
    println(s"len=${es.length}")
    println(es.map(b => f"${b & 0xff}%02x").mkString(" "))
    graft.ops.Mpeg1.decode(es) match {
      case Some(v) =>
        val img = v.frames.head
        println(s"frames=${v.frames.length} us=${v.usPerFrame} " +
          s"dims=${img.getWidth}x${img.getHeight} " +
          f"p00=${img.getRGB(0, 0) & 0xffffff}%06x")
      case None => println("DECODE FAILED")
    }
  }
}
