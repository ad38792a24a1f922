package graft

import graft.operators.Dedup

/** The CC round barrier's reliable-checkpoint mode
  * (`spark.graft.cc.reliableCheckpoint` + a session checkpoint dir):
  * same labels as the local-mode default, and checkpoint data actually
  * lands in the configured directory (executor-loss tolerance on a
  * real cluster — localCheckpoint blocks are not replicated). */
class CcCheckpointSpec extends GraftSuite {

  /** A small two-component graph: a 4-chain and a triangle. */
  private def pairs = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("doc_a", "doc_b")
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("reliable-checkpoint mode: identical labels, files in the dir") {
    val defaultClusters = labelsOf(Dedup.clusters(pairs))
    val defaultTwoStar = labelsOf(Dedup.clustersTwoStar(pairs))

    spark.conf.set("spark.graft.cc.reliableCheckpoint", "true")
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        // flag WITHOUT a dir: the barrier must key on both and stay on
        // localCheckpoint instead of crashing with "checkpoint
        // directory has not been set"
        assert(labelsOf(Dedup.clusters(pairs)) === defaultClusters)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("graft-cc-ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
      try {
        assert(labelsOf(Dedup.clusters(pairs)) === defaultClusters)
        assert(labelsOf(Dedup.clustersTwoStar(pairs)) === defaultTwoStar)
        // the rounds really checkpointed to reliable storage
        val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .filter(java.nio.file.Files.isRegularFile(_)).count()
        assert(files > 0, s"no checkpoint files under $dir")
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    } finally spark.conf.unset("spark.graft.cc.reliableCheckpoint")
  }
}
