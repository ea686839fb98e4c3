package graft.feed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.lake.{AddColumn, RenameColumn, SchemaChange, WidenColumn}

/**
 * Shared mixed-version payload machinery for the wire parsers. Both the WAL
 * text format and the envelope message format carry COLUMN NAMES inline
 * (name[type]:value tokens / {name,type,value} triples), so one stream can
 * parse every registered payload version at once:
 *
 *  - parse against the UNION of every version's columns (absent → NULL);
 *  - detect each row's `schema_ver` from the presence of that version's
 *    marker columns (names added or renamed-to in it) in the row's kv map;
 *  - fold rename chains `coalesce(newest, …, oldest)` and cast widened
 *    fields, emitting exactly the LATEST version's payload shape.
 *
 * The registry shape is the same `schema_ver → changes` map the lake
 * evolution consumes, so wire parsing and lake evolution stay in lockstep.
 */
private[feed] object VersionedPayload {

  final case class VersionShape(ver: Int, schema: StructType, markers: Seq[String])

  final case class Plan(
      shapes: Seq[VersionShape],
      /** every column name of any version, typed as its latest occurrence */
      union: StructType,
      latest: StructType,
      /** latest field name → its historical names, newest first */
      history: Map[String, Seq[String]]) {
    def versioned: Boolean = shapes.size > 1
  }

  /** Cumulative schemas per version: v1 = the base payload, each registered
    * version applies its changes on top of the previous. */
  def plan(base: StructType, registry: Map[Int, Seq[SchemaChange]]): Plan = {
    var cur = base
    // every column name any version has EVER used: reintroducing one (add or
    // rename-to after it was renamed away) would make the union parse re-type
    // the shared wire name to the newest occurrence — older rows' values
    // would cast to NULL and the rename fold would silently lose them, and
    // per-row version detection could not tell the generations apart either
    val everUsed = scala.collection.mutable.Set[String](base.fieldNames: _*)
    def claim(ver: Int, n: String): Unit = {
      require(everUsed.add(n),
        s"schema registry v$ver reuses column name '$n', which an earlier " +
          "version already used — reintroduced names are ambiguous on the " +
          "wire; pick a fresh name")
    }
    val shapes = VersionShape(1, base, Nil) +:
      registry.toSeq.sortBy(_._1).filter(_._1 > 1).map { case (ver, changes) =>
        val markers = Seq.newBuilder[String]
        changes.foreach {
          case AddColumn(n, dt, nullable) =>
            claim(ver, n)
            markers += n
            cur = StructType(cur.fields :+ StructField(n, dt, nullable))
          case RenameColumn(from, to) =>
            // loud on a missing source: a typo'd `from` would otherwise
            // no-op silently — the marker filters out, the column never
            // parses, every value null-fills, and the LAKE side's pending
            // filter skips the change too, so nothing ever surfaces it
            require(cur.fieldNames.contains(from),
              s"schema registry v$ver renames '$from' -> '$to', but " +
                s"'$from' is not in the v${ver}-preceding wire shape " +
                s"(${cur.fieldNames.mkString(", ")})")
            claim(ver, to)
            markers += to
            cur = StructType(cur.fields.map(f => if (f.name == from) f.copy(name = to) else f))
          case WidenColumn(n, to) =>
            require(cur.fieldNames.contains(n),
              s"schema registry v$ver widens '$n', but '$n' is not in the " +
                s"v${ver}-preceding wire shape (${cur.fieldNames.mkString(", ")})")
            cur = StructType(cur.fields.map(f => if (f.name == n) f.copy(dataType = to) else f))
        }
        // a name added/renamed-to and then renamed AWAY within the same
        // version never appears on that version's wire — keep only markers
        // that survive into the version's final shape (there is always at
        // least one for any column-visible change; widen-only versions have
        // none and are applied eagerly by the runner instead)
        VersionShape(ver, cur, markers.result().filter(cur.fieldNames.contains))
      }
    val latest = shapes.last.schema
    val latestType = shapes.flatMap(_.schema.fields).map(f => f.name -> f.dataType).toMap
    val unionNames = shapes.flatMap(_.schema.fieldNames).distinct
    val union = StructType(unionNames.map(n => StructField(n, latestType(n))))
    val history = {
      val h = scala.collection.mutable.Map.empty[String, List[String]]
      latest.fieldNames.foreach(n => h(n) = List(n))
      shapes.reverse.dropRight(1).foreach { s =>
        registry.getOrElse(s.ver, Nil).reverse.foreach {
          case RenameColumn(from, to) =>
            h.keys.toSeq.foreach { fin =>
              val names = h(fin)
              if (names.head == to) h(fin) = from :: names
            }
          case _ => ()
        }
      }
      h.view.mapValues(_.reverse.distinct).toMap
    }
    Plan(shapes, union, latest, history)
  }

  /** Per-row version from marker-column PRESENCE (`present(name)` = does the
    * row's wire line carry that column at all); the fold applies versions
    * ascending so the HIGHEST matching version wins; key-only/DELETE rows
    * carry no markers and fall through to 1. Presence-shaped (not a
    * name→value map) so the parsers can answer it from their one tokenizer
    * pass without building a per-row map. */
  def verOf(p: Plan)(present: String => Column): Column =
    p.shapes.drop(1).foldLeft(lit(1): Column) { (acc, s) =>
      val hit = s.markers.map(present)
        .reduceOption(_ || _).getOrElse(lit(false))
      when(hit, lit(s.ver)).otherwise(acc)
    }

  /** Latest-shape payload projection over the union-parsed columns: rename
    * chains folded newest-name-first, everything cast to the final type. */
  def foldCols(p: Plan): Seq[Column] = {
    val unionNames = p.union.fieldNames.toSet
    p.latest.fields.toSeq.map { f =>
      val names = p.history.getOrElse(f.name, Seq(f.name)).filter(unionNames.contains)
      coalesce(names.map(n => col(n).cast(f.dataType)): _*).as(f.name)
    }
  }
}
