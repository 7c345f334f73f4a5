package graft

/** Dev tool: print every registered query key, one per line (prefixed
  * for greppability) — the ground truth `bench_complete.py` checks a
  * closing solo-bench artifact against, so a bench regenerated before
  * the round's last query lands can't silently ship incomplete (the
  * round-7 q350 gap). */
object ListQueries {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(k => println(s"QUERY $k"))
}
