package graft.tools

import graft.lake.{ConcurrentCommitException, LakeTable}

/** Cross-process commit hammer for MultiProcessCommitSpec: `args = dir pid n`.
  * Each iteration commits one metrics-only epoch through a FRESH LakeTable
  * handle, so the head is re-read from DISK every time — no in-process state
  * is shared with the sibling processes; the version-file CAS is the only
  * serialization between them. [[ConcurrentCommitException]] is the
  * documented caller contract ("recompute from the current snapshot and
  * retry") — for a metrics-only commit the recompute is trivial, so the
  * hammer retries the same epoch. */
object CommitStressMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, pidS, nS) = args
    val pid = pidS.toInt
    val n = nS.toInt
    var i = 0
    var streak = 0
    while (i < n) {
      val epoch = pid * 100000L + i
      try {
        new LakeTable(dir).commit(epoch, Nil, Set.empty, Map("stress" -> 1L))
        i += 1
        streak = 0
      } catch {
        case e: ConcurrentCommitException =>
          // bounded: a protocol regression into a permanent losing streak
          // (the bug class this hammer exists to catch) must FAIL the spec
          // loudly, not hang the suite in an unbounded retry loop
          streak += 1
          if (streak > 50) { System.err.println(e.getMessage); sys.exit(2) }
      }
    }
  }
}
