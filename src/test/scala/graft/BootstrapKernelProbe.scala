package graft

import graft.operators.{Analytics, Preference}
import graft.sources.Tables

/** Measurement tool (test scope): md5 vs xxhash64 bootstrap-kernel
  * wall time for the two bootstrap faces at a given scale dir — the
  * evidence behind the flag-gated scale kernel (SCALE.md §7.13).
  * Three timed alternating passes per (face, kernel) after one
  * untimed warm pass; prints each observation and the median. Run:
  * `sbt "Test/runMain graft.BootstrapKernelProbe [sfDir]"`. */
object BootstrapKernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val ev = Tables.events(spark, sfDir).localCheckpoint()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, f: String => Unit): Unit = {
      f("md5") // untimed warm pass (codegen, page cache)
      val obs = for (_ <- 1 to 3) yield (time(f("md5")), time(f("xxhash64")))
      val (m, x) = (obs.map(_._1).sorted.apply(1),
        obs.map(_._2).sorted.apply(1))
      println(f"KERNEL $name%s md5=${obs.map(_._1).map(v => f"$v%.2f")
        .mkString("/")}%s xxhash64=${obs.map(_._2).map(v => f"$v%.2f")
        .mkString("/")}%s median md5=$m%.2f xxhash64=$x%.2f " +
        f"speedup=${m / x}%.2fx")
    }
    run("winrate_bootstrap_ci(B=200)",
      k => Preference.winrateBootstrapCi(ev, 200, k).count())
    run("value_bootstrap_ci(B=32)",
      k => Analytics.valueBootstrapCi(ev, 32, k).count())
    // optional 8x-replicate runs: B-scaling isolates the draw kernel
    // (everything else in the plan is replicate-independent) — a face
    // whose wall time does NOT grow with B is not executing its
    // resample under the probe's action (how the count()-prunable
    // left join was caught)
    if (args.lift(1).contains("deep")) {
      run("winrate_bootstrap_ci(B=1600)",
        k => Preference.winrateBootstrapCi(ev, 1600, k).count())
      run("value_bootstrap_ci(B=256)",
        k => Analytics.valueBootstrapCi(ev, 256, k).count())
    }
    spark.stop()
  }
}
