package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanFingerprint

/** Drift gate for the committed physical-plan fingerprints
  * (`PLAN_r{N}.json`, see [[graft.tools.PlanFingerprint]]): re-derives
  * every gate entry's canonical plan tree at sf0.001 and fails — printing
  * both trees — if any differs from the committed artifact. A plan change
  * can then only ship together with its reviewed fingerprint update, and a
  * bench-time anomaly with an UNCHANGED fingerprint is environment noise
  * by definition (no re-run needed to prove it). */
class PlanFingerprintSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  /** The highest-numbered committed artifact (cwd is the repo root under
    * sbt): each round replaces the previous round's file, and the spec
    * automatically pins the newest. */
  private lazy val artifact: java.io.File = {
    val re = "PLAN_r(\\d+)\\.json".r
    val files = Option(new java.io.File(".").listFiles)
      .getOrElse(Array.empty[java.io.File]).toSeq
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      })
    assert(files.nonEmpty, "no PLAN_r*.json artifact in the repo root — " +
      "generate one: sbt \"runMain graft.tools.PlanFingerprint <round>\"")
    files.maxBy(_._1)._2
  }

  test("committed plan fingerprints match re-derived executed plans " +
    "for every gate entry") {
    val json = JsonMethods.parse(
      java.nio.file.Files.readString(artifact.toPath))
    val committed = (json \ "queries").asInstanceOf[JObject].obj.map {
      case (name, v) => name -> (
        (v \ "hash").asInstanceOf[JString].s,
        (v \ "tree").asInstanceOf[JString].s)
    }.toMap
    val derived = PlanFingerprint.deriveAll(spark, "/root/testdata/sf0.001")
    assert(committed.keySet == derived.keySet,
      s"gate roster drifted from ${artifact.getName}: " +
        s"removed=${committed.keySet -- derived.keySet} " +
        s"added=${derived.keySet -- committed.keySet} — regenerate it")
    val drifted = derived.toSeq.sortBy(_._1).flatMap { case (name, fp) =>
      val (cHash, cTree) = committed(name)
      if (cHash == fp.hash) None
      else Some(s"$name: committed $cHash != derived ${fp.hash}\n" +
        s"--- committed tree\n$cTree--- derived tree\n${fp.tree}")
    }
    assert(drifted.isEmpty,
      s"${drifted.size} plan(s) drifted from ${artifact.getName} — if " +
        "intended, regenerate (runMain graft.tools.PlanFingerprint " +
        s"<round>) and commit the diff:\n\n${drifted.mkString("\n")}")
  }
}
