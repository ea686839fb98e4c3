package graft.feed

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{AddColumn, RenameColumn, SchemaChange, WidenColumn}

/** Structural invariants of the mixed-version plan under random registries:
  * whatever sequence of add/rename/widen each version applies, the union must
  * parse every historical name, the fold must target exactly the latest
  * shape, and every rename chain must resolve newest-first. Seeded ScalaCheck
  * generators driven directly (no scalatestplus bridge in the offline cache). */
class VersionedPayloadSpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("k", StringType),
    StructField("a", IntegerType),
    StructField("b", StringType),
    StructField("c", StringType)))

  /** One version's changes against the running schema: renames pick an
    * existing column and a fresh name; adds a fresh column; widens `a`. */
  private def genChanges(cur: StructType, ver: Int): Gen[Seq[SchemaChange]] = {
    val fresh = Iterator.from(0).map(i => s"v${ver}c$i")
    Gen.listOfN(2, Gen.oneOf(0, 1, 2)).map { kinds =>
      var schema = cur
      kinds.zipWithIndex.flatMap { case (kind, i) =>
        kind match {
          case 0 =>
            val n = s"v${ver}add$i"
            schema = StructType(schema.fields :+ StructField(n, StringType))
            Some(AddColumn(n, StringType))
          case 1 =>
            val renameable = schema.fieldNames.filterNot(_ == "k")
            if (renameable.isEmpty) None
            else {
              val from = renameable((ver * 7 + i) % renameable.length)
              val to = fresh.next()
              schema = StructType(schema.fields.map(f =>
                if (f.name == from) f.copy(name = to) else f))
              Some(RenameColumn(from, to))
            }
          case _ =>
            if (schema.fields.exists(f => f.name == "a" && f.dataType == IntegerType)) {
              schema = StructType(schema.fields.map(f =>
                if (f.name == "a") f.copy(dataType = LongType) else f))
              Some(WidenColumn("a", LongType))
            } else None
        }
      }
    }
  }

  test("plan invariants hold for random add/rename/widen registries") {
    val genRegistry: Gen[Map[Int, Seq[SchemaChange]]] = for {
      nVers <- Gen.choose(1, 4)
      // build versions sequentially so each generates against the running schema
    } yield {
      var cur = base
      (2 to nVers + 1).map { ver =>
        val changes = genChanges(cur, ver).sample.getOrElse(Nil)
        changes.foreach {
          case AddColumn(n, dt, _) =>
            cur = StructType(cur.fields :+ StructField(n, dt))
          case RenameColumn(from, to) =>
            cur = StructType(cur.fields.map(f => if (f.name == from) f.copy(name = to) else f))
          case WidenColumn(n, to) =>
            cur = StructType(cur.fields.map(f => if (f.name == n) f.copy(dataType = to) else f))
        }
        ver -> changes
      }.toMap
    }

    (0 until 40).foreach { trial =>
      val registry = genRegistry(Gen.Parameters.default, Seed(7L + trial)).get
      val p = VersionedPayload.plan(base, registry)
      // latest = base with all changes applied in version order
      assert(p.shapes.head.schema == base)
      assert(p.latest == p.shapes.last.schema)
      assert(p.latest.fieldNames.distinct.length == p.latest.fieldNames.length,
        "latest names unique")
      // union covers every name any version ever had
      val allNames = p.shapes.flatMap(_.schema.fieldNames).toSet
      assert(p.union.fieldNames.toSet == allNames, "union parses every historical name")
      // every history chain starts at the latest name; links that never hit
      // any version's wire (added then renamed away within one version) are
      // legal — the fold filters to parseable names, which must be non-empty
      p.latest.fieldNames.foreach { fin =>
        val chain = p.history.getOrElse(fin, Seq(fin))
        assert(chain.head == fin, s"chain for $fin starts at the final name")
        val parseable = chain.filter(allNames.contains)
        assert(parseable.nonEmpty && parseable.head == fin,
          s"fold for $fin prefers the final name: $chain")
      }
      // markers of each version exist in that version's schema
      p.shapes.drop(1).foreach { s =>
        assert(s.markers.forall(s.schema.fieldNames.contains),
          s"v${s.ver} markers ${s.markers} present in its shape")
      }
      // key column never renamed by the generator: survives to latest
      assert(p.latest.fieldNames.contains("k"))
    }
  }

  test("a rename/widen whose SOURCE column never existed on the wire is " +
    "rejected loudly (a typo'd from silently null-filled the column forever)") {
    val e = intercept[IllegalArgumentException](VersionedPayload.plan(base,
      Map(2 -> Seq(RenameColumn("aa", "a2")))))
    assert(e.getMessage.contains("'aa'"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](VersionedPayload.plan(base,
      Map(2 -> Seq(WidenColumn("zz", LongType)))))
    assert(e2.getMessage.contains("'zz'"), e2.getMessage)
    // chained renames still work: v2 a->a2, v3 a2->a3 (source exists at v3)
    VersionedPayload.plan(base, Map(
      2 -> Seq(RenameColumn("a", "a2")),
      3 -> Seq(RenameColumn("a2", "a3"))))
  }

  test("reintroducing a renamed-away column name is rejected (ambiguous wire)") {
    // v3 adds 'b' (renamed away in v2) as an int: the union would re-type the
    // shared wire name to int, casting every v1-era 'b' value to NULL before
    // the rename fold could see it — silent data loss, so plan() must refuse
    val e = intercept[IllegalArgumentException](VersionedPayload.plan(base, Map(
      2 -> Seq(RenameColumn("b", "b2")),
      3 -> Seq(AddColumn("b", IntegerType)))))
    assert(e.getMessage.contains("reuses column name 'b'"))
    // same for a rename TARGET that reuses an old name
    intercept[IllegalArgumentException](VersionedPayload.plan(base, Map(
      2 -> Seq(RenameColumn("b", "b2")),
      3 -> Seq(RenameColumn("c", "b")))))
    // fresh names stay legal
    assert(VersionedPayload.plan(base, Map(
      2 -> Seq(RenameColumn("b", "b2")),
      3 -> Seq(AddColumn("d", IntegerType)))).versioned)
  }
}
