package graft

/** Host parallel-capacity probe (no Spark): measures how pure-ALU work and
  * allocation/memory-bandwidth-bound work scale from 8 to 32 threads on THIS
  * machine. The dedup pipeline sits between the two regimes, so these two
  * numbers bracket the wall-clock scaling efficiency any engine can reach in
  * single-JVM local mode — the evidence behind BASELINE.md's scaling section.
  *
  * On a real N→4N *executor* cluster (the north_rule setting) each executor
  * adds its own DRAM channels and allocator arenas, so per-core capacity is
  * constant by construction and this ceiling does not exist.
  */
object HostCapacityProbe {

  @volatile private var sink: Long = 0L

  private def runThreads(n: Int)(body: => Long): Double = {
    val ts = (0 until n).map(_ => new Thread(() => { sink = body }))
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** pure ALU: fmix64-style mixing, zero memory traffic */
  private def alu(): Long = {
    var h = 1L; var k = 0L
    while (k < 400000000L) { h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; k += 1 }
    h
  }

  /** allocation + memory: fresh 64 KB arrays, strided touch (the shape of
    * per-row array work in a dedup pipeline)
    */
  private def alloc(): Long = {
    var s = 0L; var k = 0
    while (k < 40000) {
      val b = new Array[Byte](65536)
      var j = 0
      while (j < b.length) { b(j) = j.toByte; j += 64 }
      s += b(100); k += 1
    }
    s
  }

  def main(args: Array[String]): Unit = {
    // warmup
    runThreads(4)(alu()); runThreads(4)(alloc())
    def best(n: Int, body: () => Long): Double =
      (0 until 2).map(_ => runThreads(n)(body())).min
    val alu8 = best(8, () => alu()); val alu32 = best(32, () => alu())
    val mem8 = best(8, () => alloc()); val mem32 = best(32, () => alloc())
    val json =
      s"""{"metric":"host_capacity","alu_sec_8":$alu8,"alu_sec_32":$alu32,
         |"alloc_sec_8":$mem8,"alloc_sec_32":$mem32,
         |"alu_throughput_ratio_32_over_8":${4 * alu8 / alu32},
         |"alloc_throughput_ratio_32_over_8":${4 * mem8 / mem32},
         |"note":"per-thread work is fixed; ratio 4.0 = perfect 4x capacity"}"""
        .stripMargin.replace("\n", "")
    println(json)
  }
}
