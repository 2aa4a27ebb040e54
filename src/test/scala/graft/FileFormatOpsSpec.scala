package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FileFormatOps

/** Cross-format self-consistency of the source-format round-trip faces
  * — the oracle hash gate proves each census against raw parquet; this
  * spec pins the properties a gate outage wouldn't catch locally: the
  * adversarial rows actually survive each leg, the three formats agree
  * cell-for-cell on counts and characters, and the per-format digest
  * salts keep a copy-paste slip between faces visible. */
class FileFormatOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val csv = FileFormatOps.csvRoundtrip(spark, dir).collect()
  private lazy val jsonl = FileFormatOps.jsonlRoundtrip(spark, dir).collect()
  private lazy val orc = FileFormatOps.orcRoundtrip(spark, dir).collect()

  private def cells(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

  test("the adversarial hazard rows survive every format leg") {
    // 6 rows: comma, quotes, newline, tab+trailing space, empty, NULL —
    // 91 non-null chars total (the NULL row contributes docs, not chars)
    for ((name, rows) <- Seq(("csv", csv), ("jsonl", jsonl), ("orc", orc))) {
      val adv = rows.find(r =>
        r.getString(0) == "zz" && r.getString(1) == "adversarial")
        .getOrElse(fail(s"$name: adversarial cell missing entirely"))
      assert(adv.getLong(2) === 6L, s"$name lost adversarial rows")
      assert(adv.getLong(3) === 91L,
        s"$name mangled adversarial text (trim/escape/null-vs-empty)")
    }
  }

  test("all three formats agree cell-for-cell on counts and characters") {
    assert(cells(csv) === cells(jsonl), "csv vs jsonl census diverges")
    assert(cells(csv) === cells(orc), "csv vs orc census diverges")
  }

  test("digest salts keep the three faces distinguishable") {
    // same content, different salt: identical digests would mean a
    // copy-paste slip wired two faces to one artifact or one salt
    def digests(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    val (dc, dj, do_) = (digests(csv), digests(jsonl), digests(orc))
    val k = ("zz", "adversarial")
    assert(dc(k) !== dj(k))
    assert(dc(k) !== do_(k))
    assert(dj(k) !== do_(k))
  }
}
