package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{LocalSession, TripleStore}
import graft.operators.Docs

/** [[ExplainDump]]'s off-gate sibling (r22): formatted plans for the
  * near-dup CORPUS-SCALE configurations — the banding stage and the
  * SimHash pair pipeline at the documented scale dials, per hash family —
  * so the optimization notes' family-dial claims ("md5 → one xxhash64
  * round", "32-char hex band keys → 8-byte longs through the candidate
  * exchange") are checkable against committed text without running Spark.
  * The GATE entries' plans are ExplainDump/PlanFingerprint territory and
  * unchanged by the dial (md5 default).
  *
  * Usage: `sbt "runMain graft.tools.ScalePlanDump <sfDir> <outDir>"` —
  * writes `<outDir>/scale_minhash_banding_<family>.txt` and
  * `<outDir>/scale_simhash_pairs_<family>.txt` for both families.
  */
object ScalePlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScalePlanDump <sfDir> <outDir>")
    val Array(sfDir, outDir) = args.take(2)
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"$name.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] $name -> $outDir/$name.txt")
    }
    val arrs = Docs.shingleArraysOf(
      TripleStore.table(spark, sfDir, "documents"))
    for (family <- Seq("md5", "xx64")) {
      // the documented scale dials: 24 hashes / 6 bands of 4 (minhash),
      // 64-bit fingerprints / 2 bands / hamming <= 1 (simhash)
      dump(s"scale_minhash_banding_$family",
        Docs.minhashCandidatePlan(arrs, 24, 4, family))
      dump(s"scale_simhash_pairs_$family",
        Docs.simhashNeardupPairs(spark, sfDir, simBits = 64, numBands = 2,
          maxHamming = 1L, family = family))
    }
    spark.stop()
  }
}
