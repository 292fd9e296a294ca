package graft.ops

import graft.SparkSuite

/** Throwaway smoke for the new video query entries (values must match the
  * pinned VALUES oracles in SparkEntry.oracleSql). */
class VideoQuerySmoke extends SparkSuite {
  test("q_multimodal_video and q_multimodal_vframes match pinned oracles") {
    val sf = "/root/testdata/sf0.001"
    val vid = graft.SparkEntry.queries("q_multimodal_video")(spark, sf).collect()
    assert(vid.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 6L), ("g", 6L), ("r", 6L)))
    val vf = graft.SparkEntry.queries("q_multimodal_vframes")(spark, sf).collect()
    assert(vf.map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((0, 0L, "r"), (1, 80L, "g")))
  }
}
