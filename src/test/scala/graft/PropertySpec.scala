package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.SpatialOps
import graft.pipeline._

/** Property-based tests (SURVEY §5.2 item 3): algebraic laws checked
  * over ScalaCheck-generated inputs (raw Gen + fixed seed — the
  * scalatest-plus bridge isn't in the offline cache; determinism is a
  * feature here anyway). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** n deterministic samples of g. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val coordGen = Gen.chooseNum(0, 50)

  test("law: bbox prefilter never changes buffer-aggregate results") {
    val cases = samples(for {
      sxy <- Gen.listOfN(8, Gen.zip(coordGen, coordGen))
      fxy <- Gen.listOfN(40, Gen.zip(coordGen, coordGen))
      r <- Gen.chooseNum(2, 10)
    } yield (sxy, fxy, r), 4)
    cases.foreach { case (sxy, fxy, r) =>
      val sensors = sxy.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x.toDouble, y.toDouble) }
        .toDF("id_sensor", "x", "y")
      val features = fxy.zipWithIndex
        .map { case ((x, y), j) => (x.toDouble, y.toDouble, j.toDouble) }
        .toDF("x", "y", "v")
      val withClip = SpatialOps.bufferAggregate(sensors, features, r,
        Seq("sum", "count"), Seq("v")).orderBy("id_sensor").collect().toSeq
      val s = sensors.select(col("id_sensor"), col("x").as("sx"), col("y").as("sy"))
      val noClip = features.join(broadcast(s),
        SpatialOps.dist2(col("sx"), col("sy"), col("x"), col("y")) <= r * r)
        .groupBy("id_sensor").agg(sum("v").as("sum_v"), count(lit(1)).as("count_v"))
        .join(sensors, Seq("id_sensor"), "right")
        .select("id_sensor", "x", "y", "sum_v", "count_v")
        .orderBy("id_sensor").collect().toSeq
      assert(withClip.map(r0 => (r0.getLong(0), Option(r0.get(3)), Option(r0.get(4)))) ==
        noClip.map(r0 => (r0.getLong(0), Option(r0.get(3)), Option(r0.get(4)))),
        s"clip law failed for r=$r")
    }
  }

  test("law: kNN with k >= |features| equals the unrestricted aggregate") {
    val cases = samples(for {
      sxy <- Gen.listOfN(4, Gen.zip(coordGen, coordGen))
      fxy <- Gen.listOfN(12, Gen.zip(coordGen, coordGen))
    } yield (sxy, fxy), 4)
    cases.foreach { case (sxy, fxy) =>
      val sensors = sxy.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x.toDouble, y.toDouble) }
        .toDF("id_sensor", "x", "y")
      val features = fxy.zipWithIndex
        .map { case ((x, y), j) => (j.toLong, x.toDouble, y.toDouble, (j % 5).toDouble) }
        .toDF("feature_id", "x", "y", "v")
      val knn = SpatialOps.knnAggregate(sensors, features, k = 100,
        Seq("sum"), Seq("v"), "feature_id")
        .select("id_sensor", "sum_v").orderBy("id_sensor").collect()
      val full = features.agg(sum("v")).head.getDouble(0)
      assert(knn.forall(_.getDouble(1) == full))
    }
  }

  test("law: pruned kNN (any radius, and auto) equals brute-force kNN") {
    val cases = samples(for {
      sxy <- Gen.listOfN(6, Gen.zip(coordGen, coordGen))
      fxy <- Gen.listOfN(40, Gen.zip(coordGen, coordGen))
      r <- Gen.chooseNum(1, 40)
    } yield (sxy, fxy, r), 4)
    cases.foreach { case (sxy, fxy, r) =>
      val sensors = sxy.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x.toDouble, y.toDouble) }
        .toDF("id_sensor", "x", "y")
      val features = fxy.zipWithIndex
        .map { case ((x, y), j) => (j.toLong, x.toDouble, y.toDouble, (j % 7).toDouble) }
        .toDF("feature_id", "x", "y", "v")
      def run(pr: Option[Double]): Seq[(Long, Option[Any], Option[Any])] =
        SpatialOps.knnAggregate(sensors, features, k = 3,
          Seq("mean", "count"), Seq("v"), "feature_id", pruneRadius = pr)
          .select("id_sensor", "mean_v", "count_v").orderBy("id_sensor").collect().toSeq
          .map(row => (row.getLong(0), Option(row.get(1)), Option(row.get(2))))
      val brute = run(Some(0.0))
      // mid-size radius leaves a mix of solved positions and fallback
      assert(run(Some(r.toDouble)) == brute, s"pruned != brute at r=$r")
      assert(run(None) == brute, "auto strategy != brute")
    }
  }

  test("kNN: null-coordinate sensors get NULL stats; NaN positions dedup and rejoin") {
    val nan = Double.NaN
    val sensors = Seq(
      (1L, Some(0.0), Some(0.0)),
      (2L, None, Some(5.0)),        // null x → NULL stats
      (3L, Some(nan), Some(1.0)),   // NaN position, duplicated at 4
      (4L, Some(nan), Some(1.0))
    ).toDF("id_sensor", "x", "y")
    val features = Seq((10L, 0.0, 1.0, 2.0), (11L, 3.0, 4.0, 6.0))
      .toDF("feature_id", "x", "y", "v")
    Seq(Some(0.0), Some(2.0), None).foreach { pr =>
      val out = SpatialOps.knnAggregate(sensors, features, k = 1,
        Seq("sum"), Seq("v"), "feature_id", pruneRadius = pr)
        .select("id_sensor", "sum_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(out(1L) == Some(2.0), s"pr=$pr")
      assert(out(2L).isEmpty, s"null-coordinate sensor must get NULL stats (pr=$pr)")
      assert(out(3L) == out(4L) && out(3L).nonEmpty,
        s"NaN-position duplicates must receive identical non-null stats (pr=$pr)")
    }
  }

  test("law: IDW at an exact sensor location returns that sensor's value") {
    val cases = samples(
      Gen.listOfN(6, Gen.zip(Gen.zip(coordGen, coordGen), Gen.chooseNum(-100, 100))), 4)
    cases.foreach { pts =>
      val distinct = pts.map { case ((x, y), v) => ((x.toDouble, y.toDouble), v.toDouble) }
        .toMap.toSeq
      val sensors = distinct.map { case ((x, y), v) => (x, y, v) }.toDF("x", "y", "v")
      val ((x0, y0), v0) = distinct.head
      val out = SpatialOps.idw(sensors, "v", 2, x0, y0, 1, 1, 1, 1).head
      assert(out.getDouble(2) == v0, s"exact-hit law failed at ($x0,$y0)")
    }
  }

  test("law: pipeline JSON round-trip is identity for arbitrary specs") {
    val jsonGen: Gen[Json] = Gen.oneOf(
      Gen.alphaNumStr.map(JStr(_)),
      Gen.chooseNum(-1000000, 1000000).map(n => JNum(n.toDouble)),
      Gen.oneOf(true, false).map(JBool(_)),
      Gen.listOfN(3, Gen.alphaNumStr).map(xs => JArr(xs.map(JStr(_): Json).toVector)))
    val opGen = for {
      name <- Gen.identifier.suchThat(_.nonEmpty)
      fn <- Gen.identifier.suchThat(_.nonEmpty)
      n <- Gen.chooseNum(0, 4)
      keys <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty))
      vals <- Gen.listOfN(n, jsonGen)
    } yield Operation(name, fn, scala.collection.immutable.ListMap(keys.zip(vals): _*))
    val cases = samples(for {
      name <- Gen.identifier.suchThat(_.nonEmpty)
      ops <- Gen.listOfN(4, opGen)
    } yield (name, ops), 20)
    cases.foreach { case (name, ops) =>
      val p = Pipeline(name, ops.toVector)
      val back = Pipeline.fromJson(p.toJson.render)
      assert(back.name == p.name && back.operations == p.operations)
      assert(back.toJson.render == p.toJson.render)
    }
  }

  test("law: merged agg partials equal the single-pass aggregate for ANY batch split") {
    // the incremental-materialization contract (q106): however history
    // is cut into state+delta, the merge must be bit-equal to recompute
    val rows = (0 until 400)
      .map(i => (i.toLong % 23, BigDecimal((i * 37 % 1000) / 100.0).setScale(2)))
      .toDF("k", "v")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("s"))
    val full = partial(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    for (cut <- Seq(0, 1, 137, 399, 400)) {
      val merged = graft.ops.Aggregates.mergeAggStates(
          partial(rows.filter(col("v") * 100 < cut)),
          partial(rows.filter(col("v") * 100 >= cut)), "k", Seq("n", "s"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDecimal(2).setScale(2))).toMap
      assert(merged.view.mapValues { case (n, s) => (n, BigDecimal(s)) }.toMap ==
        full.view.mapValues { case (n, s) => (n, BigDecimal(s)) }.toMap,
        s"cut at $cut diverged")
    }
  }

  test("law: sqrt-temperature mixing keeps every doc of the rarest source") {
    val docs = (1 to 300).map { i =>
      val src = if (i <= 4) "rare" else if (i <= 60) "mid" else "big"
      (i.toLong, s"document body $i", src)
    }.toDF("doc_id", "text", "source")
    val kept = graft.ext.Curation
      .sqrtTemperatureSample(docs, col("source"), col("text"))
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 4L, s"rarest source must keep all 4, got $kept")
    // larger sources are subsampled harder: expected ~ sqrt(4*n)
    assert(kept("big") < 240L && kept("big") > 0L, s"big source rate wrong: $kept")
    assert(kept.getOrElse("mid", 0L) <= 56L)
  }

  test("law: union of per-file reads equals whole-directory read (S4)") {
    val cases = samples(Gen.listOfN(3, Gen.listOfN(4, Gen.chooseNum(0, 1000))), 3)
    cases.foreach { fileRows =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
      fileRows.zipWithIndex.foreach { case (rows, i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/f$i.json"),
          rows.map(v => s"""{"m": $v}""").mkString("\n"))
      }
      val whole = spark.read.json(s"$dir").agg(sum("m"), count(lit(1))).head
      val parts = graft.io.Sources.openDirOfData(spark, dir)
        .agg(sum("m"), count(lit(1))).head
      assert(whole == parts)
    }
  }

  test("law: shapefile point layers round-trip randomized frames exactly") {
    import graft.geo.Geo
    val cases = samples(for {
      pts <- Gen.listOfN(12, Gen.zip(Gen.chooseNum(-1000, 1000),
        Gen.chooseNum(-1000, 1000), Gen.chooseNum(-500000L, 500000L)))
    } yield pts, 3)
    cases.zipWithIndex.foreach { case (pts, ci) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_shp_law").toString
      val df = pts.zipWithIndex
        .map { case ((x, y, m), i) => (i.toLong, m, x / 8.0, y / 8.0) }
        .toDF("id", "m", "x", "y")
        .select(col("id"), col("m"),
          Geo.stPoint(col("x"), col("y")).as("geometry"))
      graft.io.Shapefile.writePoints(df, s"$dir/law$ci")
      val back = graft.io.Shapefile.read(spark, s"$dir/law$ci")
        .select(col("id"), col("m"),
          Geo.stX(col("geometry")).as("x"), Geo.stY(col("geometry")).as("y"))
        .orderBy("id").collect()
      val want = pts.zipWithIndex.map { case ((x, y, m), i) =>
        (i.toLong, m, x / 8.0, y / 8.0) }
      assert(back.length == want.length)
      back.zip(want).foreach { case (r, (id, m, x, y)) =>
        assert(r.getLong(0) == id && r.getLong(1) == m &&
          r.getDouble(2) == x && r.getDouble(3) == y)
      }
    }
  }

  test("law: boruvkaMst weight equals brute-force Prim on random graphs") {
    def kruskalWeight(edges: Seq[(Long, Long, Long)]): Long = {
      // reference forest weight via Kruskal + union-find (weights are
      // unique by construction, so the forest weight is unique too)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      var total = 0L
      edges.sortBy(_._3).foreach { case (u, v, w) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { parent(ru) = rv; total += w }
      }
      total
    }
    val cases = samples(for {
      n <- Gen.chooseNum(6, 14)
      m <- Gen.chooseNum(n, n * 3)
      pairs <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, 13), Gen.chooseNum(0, 13)))
    } yield (n, pairs.filter(p => p._1 != p._2)), 4)
    cases.foreach { case (_, pairs) =>
      if (pairs.nonEmpty) {
        // unique weights from the canonical pair id
        val edges = pairs.map { case (u, v) =>
          val (a, b) = (math.min(u, v).toLong, math.max(u, v).toLong)
          (a, b, a * 1009L + b * 31L + 7L)
        }.distinct
        val mst = graft.ext.Graph.boruvkaMst(
          edges.toDF("u", "v", "w"), "u", "v", "w")
          .collect().map(_.getLong(2))
        assert(mst.sum == kruskalWeight(edges),
          s"forest weight mismatch on $edges")
      }
    }
  }

  test("law: dbscan agrees with a naive reference on random point sets") {
    def naive(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
        : Map[Long, (String, Option[Long])] = {
      def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
        (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      val nbrs = pts.map(p =>
        p._1 -> pts.filter(q => d2(p, q) <= eps * eps).map(_._1)).toMap
      val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
      // components over core-core eps edges (min-label fixpoint)
      var lab = core.map(c => c -> c).toMap
      var changed = true
      while (changed) {
        changed = false
        for (c <- core; n <- nbrs(c) if core(n))
          if (lab(n) < lab(c)) { lab += c -> lab(n); changed = true }
      }
      pts.map { p =>
        val id = p._1
        if (core(id)) id -> (("core", Some(lab(id))))
        else {
          val coreNbrs = nbrs(id).filter(core)
          if (coreNbrs.nonEmpty)
            id -> (("border", Some(coreNbrs.map(lab).min)))
          else id -> (("noise", None))
        }
      }.toMap
    }
    val cases = samples(for {
      pts <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)))
      minPts <- Gen.chooseNum(2, 4)
    } yield (pts, minPts), 3)
    cases.foreach { case (raw, minPts) =>
      val pts = raw.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, x.toDouble, y.toDouble) }
      val eps = 3.0
      val got = graft.ext.Clustering.dbscan(pts.toDF("id", "x", "y"),
          "id", "x", "y", eps, minPts)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
        .toMap
      assert(got == naive(pts, eps, minPts))
    }
  }

  test("law: TIFF codecs round-trip arbitrary byte streams (LZW/PackBits/predictor)") {
    import graft.io.GeoTiff.Codecs
    // byte-content generators spanning the codec-relevant regimes:
    // long runs (PackBits packets, LZW dictionary hits), small
    // alphabets (deep LZW chains), and full-range noise (incompressible
    // paths, width changes); sizes straddle row and code boundaries
    val contentGen = for {
      size <- Gen.chooseNum(1, 5000)
      mode <- Gen.chooseNum(0, 2)
      bytes <- mode match {
        case 0 => Gen.listOfN(size, Gen.chooseNum(0, 3).map(_.toByte))
        case 1 => Gen.listOfN(size, Gen.oneOf(Seq(7.toByte, 9.toByte)))
        case _ => Gen.listOfN(size, Gen.chooseNum(-128, 127).map(_.toByte))
      }
    } yield bytes.toArray
    samples(contentGen, 40).foreach { data =>
      val lzw = Codecs.lzwDecode(Codecs.lzwEncode(data), data.length, "prop")
      assert(java.util.Arrays.equals(lzw, data), s"lzw n=${data.length}")
      val defl = Codecs.inflate(Codecs.deflate(data), data.length, "prop")
      assert(java.util.Arrays.equals(defl, data), s"deflate n=${data.length}")
    }
    // PackBits + predictor operate on (w, h)-shaped buffers
    val shapedGen = for {
      w <- Gen.chooseNum(1, 60)
      h <- Gen.chooseNum(1, 40)
      bytesPer <- Gen.oneOf(1, 2, 4)
      bytes <- Gen.listOfN(w * h * bytesPer, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (w, h, bytesPer, bytes.toArray)
    samples(shapedGen, 40).foreach { case (w, h, bytesPer, data) =>
      val pb = Codecs.packBitsDecode(
        Codecs.packBitsEncode(data, w * bytesPer), data.length, "prop")
      assert(java.util.Arrays.equals(pb, data), s"packbits ${w}x$h")
      val d = data.clone()
      Codecs.applyHorizontalDiff(d, w, h, 1, bytesPer, littleEndian = true)
      Codecs.undoHorizontalDiff(d, w, h, 1, bytesPer, littleEndian = true)
      assert(java.util.Arrays.equals(d, data), s"predictor ${w}x$h b$bytesPer")
      // floating-point predictor (3): apply→undo is identity on the
      // raw little-endian byte image (4- and 8-byte sample widths)
      if (bytesPer != 1) {
        val fp = Codecs.undoFloatPredictor(
          Codecs.applyFloatPredictor(data, w, h, 1, bytesPer),
          w, h, 1, bytesPer, littleEndian = true)
        assert(java.util.Arrays.equals(fp, data), s"fp-pred ${w}x$h b$bytesPer")
      }
    }
  }
}
