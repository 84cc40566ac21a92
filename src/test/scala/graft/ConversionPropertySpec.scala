package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.convert.SchemaConverter
import graft.model._

/** Property-based invariants of the conversion procedure over random FK
  * graphs (SURVEY.md §5.4).
  */
class ConversionPropertySpec extends SparkSpec {

  private val genDb: Gen[DatabaseMeta] = for {
    n <- Gen.choose(1, 8)
    names = (0 until n).map(i => s"t$i")
    fkCounts <- Gen.listOfN(n, Gen.frequency(3 -> 0, 3 -> 1, 2 -> 2, 1 -> 3))
    fkTargets <- Gen.sequence[Seq[Seq[Int]], Seq[Int]](
      fkCounts.map(c => Gen.listOfN(c, Gen.choose(0, n - 1)).map(_.toSeq)))
    uafs <- Gen.listOfN(n, Gen.choose(0L, 200L))
    maf <- Gen.choose(0L, 100L)
  } yield {
    val fks = names.indices.map { i =>
      fkTargets(i).zipWithIndex.map { case (tgt, j) =>
        ForeignKeyMeta(s"fk${j}_$i", names(tgt), "id")
      }
    }
    val refdBy = names.indices.map { i =>
      names.indices.filter(j => fks(j).exists(_.referencedTable == names(i)))
        .map(names).distinct.sorted
    }
    DatabaseMeta("prop", names.indices.map { i =>
      TableMeta(names(i), 10L * (i + 1),
        Seq("id") ++ fks(i).map(_.columnName) ++ Seq(s"v$i"),
        Seq("id"), fks(i), refdBy(i).nonEmpty, refdBy(i), gaf = 0L, uaf = uafs(i))
    }, maf.toDouble)
  }

  private def walk(n: CollectionNode): Seq[CollectionNode] =
    n +: n.embedded.flatMap(walk)

  test("conversion invariants hold on random FK graphs") {
    val prop = Prop.forAll(genDb) { db =>
      val topo = SchemaConverter.topoOrder(db)
      val out = SchemaConverter.convert(db)
      val nodes = out.roots.flatMap(walk)
      val appearances = nodes.groupBy(_.name).view.mapValues(_.size).toMap

      val droppedAbsent = topo.droppedCyclic.forall(t => !appearances.contains(t))
      val allPlaced = topo.order.forall(t => appearances.getOrElse(t, 0) >= 1)
      val atMostTwice = appearances.values.forall(_ <= 2)
      val twiceOnlyTwoWay = appearances.forall { case (name, cnt) =>
        cnt == 1 || nodes.filter(_.name == name)
          .forall(_.kind == ConversionKind.TwoWayEmbedded)
      }
      val manyFkReferencing = db.tables
        .filter(t => t.numOfForeignKeys > 2 && topo.order.contains(t.name))
        .forall(t => out.roots.exists(r =>
          r.name == t.name && r.kind == ConversionKind.Referencing))
      val zeroFkRoots = db.tables.filter(_.foreignKeys.isEmpty).forall(t =>
        out.roots.exists(r => r.name == t.name && r.kind == ConversionKind.Root))

      droppedAbsent && allPlaced && atMostTwice && twiceOnlyTwoWay &&
        manyFkReferencing && zeroFkRoots
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
