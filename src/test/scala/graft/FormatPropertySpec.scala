package graft

import graft.format.{FragmentMeta, LanceFormat, Manifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Property tests for the table-format layer (SURVEY §7.1 step 1/2):
  * schema + manifest round-trips must be lossless for every type the
  * engine stores, including nested types and column metadata (the
  * vector-dimension fidelity the reference loses).
  */
class FormatPropertySpec extends AnyFunSuite {

  /** Deterministic sampling (no scalatestplus bridge in the offline cache):
    * draws `n` seeded values from a generator.
    */
  private def samples[A](gen: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val leafType: Gen[DataType] = Gen.oneOf(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, BinaryType, DateType, TimestampType,
    DecimalType(18, 2), DecimalType(38, 10))

  private def fieldName: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (head :: tail).mkString

  private val dataType: Gen[DataType] = Gen.frequency(
    6 -> leafType,
    2 -> leafType.map(ArrayType(_, containsNull = true)),
    1 -> leafType.map(MapType(StringType, _, valueContainsNull = true)),
    1 -> (for {
      n <- Gen.choose(1, 3)
      names <- Gen.listOfN(n, fieldName)
      types <- Gen.listOfN(n, leafType)
    } yield StructType(names.distinct.zip(types).map { case (nm, t) =>
      StructField(nm, t)
    })))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 6)
    names <- Gen.listOfN(n, fieldName)
    types <- Gen.listOfN(n, dataType)
    dims <- Gen.listOfN(n, Gen.option(Gen.choose(1, 4096)))
  } yield StructType(names.distinct.zip(types.zip(dims)).map {
    case (nm, (t, dim)) =>
      val meta = dim.fold(Metadata.empty)(d =>
        new MetadataBuilder().putLong(Lance.VectorDimKey, d.toLong).build())
      StructField(nm, t, nullable = true, meta)
  })

  test("schema JSON round-trips through the manifest, metadata included") {
    samples(schemaGen).foreach { schema =>
      val m = Manifest(1L, schema.json, Seq(FragmentMeta(0, "f.parquet", 10)))
      assert(m.schema == schema)
      schema.fields.foreach { f =>
        assert(m.schema(f.name).metadata == f.metadata)
      }
    }
  }

  test("manifest survives a filesystem write/read cycle") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "fmt-prop-")
      .toAbsolutePath.toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val countsGen = Gen.listOf(Gen.choose(1L, 1000000L))
    samples(Gen.zip(schemaGen, countsGen), n = 25).foreach { case (schema, counts) =>
      val root = new Path(s"$dir/${java.util.UUID.randomUUID()}")
      val fs = LanceFormat.fileSystem(root, conf)
      val frags = counts.zipWithIndex.map { case (c, i) =>
        FragmentMeta(i, s"frag-$i.parquet", c)
      }
      val committed = LanceFormat.commitAppend(fs, root, schema, frags)
      val back = LanceFormat.readLatest(fs, root).get
      assert(back.schema == schema)
      assert(back.fragments.map(f => (f.file, f.rowCount)) ==
        frags.map(f => (f.file, f.rowCount)))
      assert(back.rowCount == counts.sum)
      assert(back.version == committed.version)
    }
  }
}
