package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Property-based tests (SURVEY.md §5.3): parse∘serialize identity, clip
  * non-negativity, dedup idempotence, window-sum conservation. ScalaCheck
  * generators sampled with fixed seeds (deterministic runs; each case
  * spins real Spark jobs, so case counts stay small).
  */
class PropertySpec extends GraftSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val telemetryGen = Gen.listOfN(20, for {
    m <- Gen.oneOf("m1", "m2", "NC_Machine_AC")
    t <- Gen.chooseNum(-50.0, 150.0)
    v <- Gen.chooseNum(-1.0, 8.0)
    ts <- Gen.chooseNum(1700000000L, 1800000000L)
  } yield (m, t, v, ts))

  test("property: parseWire(toWire(x)) == x for arbitrary telemetry") {
    import spark.implicits._
    samples(telemetryGen, 5).foreach { rows =>
      val df = rows.toDF("machineId", "temperature", "vibration", "timestamp")
      val back = StreamOps.parseWire(StreamOps.toWire(df))
        .select($"machineId", $"temperature", $"vibration",
          $"ts".cast("long").as("timestamp"))
      assert(back.count() == rows.length)
      assert(back.except(df).count() == 0)
    }
  }

  test("property: clip guardrail never yields negatives and is idempotent") {
    import spark.implicits._
    samples(Gen.listOfN(30, Gen.chooseNum(-10.0, 10.0)), 5).foreach { xs =>
      val df = xs.toDF("v").select(greatest($"v", lit(0.0)).as("c"))
      assert(df.filter($"c" < 0.0).count() == 0)
      val twice = df.select(greatest($"c", lit(0.0)).as("c2"), $"c")
      assert(twice.filter($"c2" =!= $"c").count() == 0)
    }
  }

  test("property: dropDuplicates is idempotent and minimal") {
    import spark.implicits._
    samples(Gen.listOfN(40, Gen.chooseNum(0, 5)), 5).foreach { keys =>
      val df = keys.zipWithIndex.toDF("k", "i")
      val once = df.dropDuplicates("k")
      assert(once.count() == keys.distinct.length)
      assert(once.dropDuplicates("k").count() == once.count())
    }
  }

  test("property: grouped sums conserve the global sum") {
    import spark.implicits._
    val gen = Gen.listOfN(50, for {
      g <- Gen.chooseNum(0, 3)
      v <- Gen.chooseNum(-1000, 1000)
    } yield (g, v))
    samples(gen, 5).foreach { rows =>
      val df = rows.toDF("g", "v")
      val global = df.agg(sum($"v".cast("long"))).collect()(0).getLong(0)
      val grouped = df.groupBy($"g").agg(sum($"v".cast("long")).as("s"))
        .agg(sum($"s")).collect()(0).getLong(0)
      assert(global == grouped)
    }
  }

  test("property: d12 chunks tile every token with 8-token overlap, none lost") {
    // chunk layout invariants, independent of the corpus: chunk i holds
    // tokens [i·56+1, i·56+64]; consecutive-chunk overlap re-covers the
    // last 8; union == all tokens
    import spark.implicits._
    val out = graft.operators.TextOps.d12ChunkSplit(spark, sfTiny).cache()
    try {
      val docs = Tables.documents(spark, sfTiny)
        .select($"doc_id", size(filter(split(trim($"text"), "\\s+"), t => t =!= "")).as("n"))
        .filter($"n" >= 1)
      // every chunk ≤ 64 tokens, ≥ 1 token
      assert(out.filter($"n_chunk_tokens" > 64 || $"n_chunk_tokens" < 1).count() == 0)
      // exact tiling: chunk i covers tokens [i·56+1, min(i·56+64, n)]
      val bad = out.join(docs, "doc_id")
        .filter($"n_chunk_tokens" =!= least(lit(64), $"n" - $"chunk_id" * 56))
        .count()
      assert(bad == 0, "every chunk must cover exactly its stride window")
      // chunk count: ceil(n / 56) per doc
      val perDoc = out.groupBy($"doc_id").agg(count(lit(1)).as("k"))
      val badK = perDoc.join(docs, "doc_id")
        .filter($"k" =!= ceil($"n" / 56.0).cast("long")).count()
      assert(badK == 0)
      assert(perDoc.count() == docs.count())
    } finally out.unpersist()
  }

  test("property: t13 forward fill preserves observed values and fills only gaps") {
    import spark.implicits._
    val out = graft.operators.Telemetry.t13ForwardFill(spark, sfTiny).cache()
    try {
      // observed rows pass through untouched
      assert(out.filter($"v_raw".isNotNull && $"v_fill" =!= $"v_raw").count() == 0)
      // filled rows are exactly the null-raw rows with some prior value
      assert(out.filter($"was_filled" === 1 && $"v_raw".isNotNull).count() == 0)
      // idempotence: filling an already-filled series changes nothing
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val refill = out.withColumn("v2", last($"v_fill", ignoreNulls = true).over(w))
      assert(refill.filter($"v_fill".isNotNull && $"v2" =!= $"v_fill").count() == 0)
    } finally out.unpersist()
  }

  test("property: bloom prefilter never drops an inserted key (no false negatives)") {
    import spark.implicits._
    import graft.operators.Advanced
    // arbitrary key sets, including negatives and duplicates
    samples(Gen.listOfN(60, Gen.chooseNum(-100000L, 100000L)), 4).foreach { keys =>
      val dim = keys.toDF("k")
      val bloom = Advanced.bloomArray(dim, "k")
      // probe with the inserted keys themselves: every one must pass
      val kept = Advanced.bloomPrefilter(dim, "k", bloom).count()
      assert(kept == keys.length.toLong, s"bloom dropped ${keys.length - kept} inserted keys")
    }
  }

  test("property: greedy packing bins are dense and conserve token mass") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(1, 600)), 4).foreach { lens =>
      val df = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
      val w = org.apache.spark.sql.expressions.Window.orderBy($"id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val packed = df.withColumn("cum", sum($"n").over(w))
        .withColumn("bin", expr("(cum - n) div 512"))
        .groupBy($"bin").agg(sum($"n").as("toks"), count(lit(1)).as("docs"))
      // conservation: every token lands in exactly one bin
      assert(packed.agg(sum($"toks")).collect()(0).getLong(0) == lens.map(_.toLong).sum)
      // density: bins are a contiguous 0..max range (a doc can straddle,
      // never leave an empty bin behind — cum only moves forward by n)
      val bins = packed.select($"bin").as[Long].collect().sorted
      assert(bins.head == 0L)
      // a gap can only appear when one doc spans multiple whole bins —
      // with n <= 600 < 2*512 a doc skips at most one bin
      bins.sliding(2).foreach { case Array(a, b) => assert(b - a <= 2); case _ => }
    }
  }

  test("property: packStream equals packSequences for arbitrary corpora and batchings") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TokDoc
    implicit val sqlCtx = spark.sqlContext
    // random doc sizes over random langs; replay in doc_id order split at
    // a random batch boundary — the streaming running-count state must
    // reproduce the batch windowed packing exactly
    val gen = for {
      lens <- Gen.listOfN(60, Gen.chooseNum(1, 600))
      langs <- Gen.listOfN(60, Gen.oneOf("en", "de"))
      cut <- Gen.chooseNum(1, 59)
    } yield (lens, langs, cut)
    samples(gen, 3).foreach { case (lens, langs, cut) =>
      val docs = lens.zip(langs).zipWithIndex
        .map { case ((n, l), i) => TokDoc(i.toLong, l, n) }
      val in = MemoryStream[TokDoc]
      val name = s"prop_pack_${docs.hashCode.abs}"
      val q = StreamOps.packStream(in.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        Seq(docs.take(cut), docs.drop(cut)).foreach { b =>
          in.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table(name)
        .groupBy($"lang", $"shard", $"seq_id")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("seq_tokens"),
          min($"doc_id").as("first_doc"))
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.Curation.packSequences(spark,
        docs.toDF().select($"doc_id", $"lang", $"n_tok"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    }
  }

  test("property: chunk dedup conserves chunks and flags all planted copies") {
    import spark.implicits._
    // random word-salad docs with a random subset duplicated under new ids
    val gen = for {
      lens <- Gen.listOfN(12, Gen.chooseNum(1, 80))
      words <- Gen.listOfN(12, Gen.chooseNum(0, 6))
      nDup <- Gen.chooseNum(1, 6)
    } yield (lens, words, nDup)
    samples(gen, 3).foreach { case (lens, words, nDup) =>
      val base = lens.zip(words).zipWithIndex.map { case ((n, w), i) =>
        (i.toLong, (0 until n).map(k => s"t${(w + k * 7) % 13}").mkString(" "))
      }
      val copies = base.take(nDup).map { case (id, t) => (1000L + id, t) }
      val out = graft.operators.TextOps.chunkDedup(
        (base ++ copies).toDF("doc_id", "text")).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_chunks"), r.getAs[Double]("dup_chunk_ratio"))).toMap
      // chunk conservation per doc
      base.foreach { case (id, t) =>
        val nt = t.split("\\s+").count(_.nonEmpty)
        assert(out(id)._1 == math.ceil(nt / 16.0).toLong)
      }
      // every full copy (higher doc_id than its source) is fully flagged
      copies.foreach { case (id, _) => assert(out(id)._2 == 1.0, s"copy $id") }
    }
  }

  // --- per-file column-stats laws (LakeSinkStats) -----------------------------

  import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String
  import graft.sources.LakeSinkStats

  private val statSchema = StructType(Seq(
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("s", StringType)))

  private val statStrGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.listOfN(6, Gen.chooseNum(1, 0x2fff)).map(_.map(_.toChar).mkString),
    Gen.const(""),
    Gen.const("\u0001\u0002\u0003 sep\nand\ttab"))

  private val statRowGen: Gen[List[(Option[Long], Option[Double], Option[String])]] =
    Gen.listOfN(25, for {
      l <- Gen.option(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e9, 1e9),
        Gen.oneOf(Double.NaN, 0.0, -0.0, 1e-300)))
      t <- Gen.option(statStrGen)
    } yield (l, d, t))

  /** Feed one column's values through a fresh tracker array (nulls go
    * through nullSeen — exactly the writer's loop). */
  private def trackedBlob(rows: Seq[(Option[Long], Option[Double], Option[String])]): String = {
    val ts = LakeSinkStats.trackers(statSchema)
    rows.foreach { case (l, d, t) =>
      val row = new GenericInternalRow(Array[Any](
        l.map(Long.box).orNull, d.map(Double.box).orNull,
        t.map(UTF8String.fromString).orNull))
      (0 to 2).foreach(i =>
        if (row.isNullAt(i)) ts(i).get.nullSeen() else ts(i).get.update(row, i))
    }
    LakeSinkStats.blobOf(ts)
  }

  private def nullCountOf(rows: Seq[(Option[Long], Option[Double], Option[String])],
      c: String): Long = c match {
    case "l" => rows.count(_._1.isEmpty).toLong
    case "d" => rows.count(_._2.isEmpty).toLong
    case "s" => rows.count(_._3.isEmpty).toLong
  }

  private def expectedBounds(rows: Seq[(Option[Long], Option[Double], Option[String])])
      : Seq[Option[(Any, Any)]] = Seq(
    rows.flatMap(_._1).map(Long.box) match {
      case Nil => None
      case vs => Some((vs.minBy(identity[java.lang.Long]),
        vs.maxBy(identity[java.lang.Long])))
    },
    rows.flatMap(_._2).map(Double.box) match {
      case Nil => None
      case vs =>
        Some((vs.reduce((a, b) => if (java.lang.Double.compare(a, b) <= 0) a else b),
          vs.reduce((a, b) => if (java.lang.Double.compare(a, b) >= 0) a else b)))
    },
    rows.flatMap(_._3).map(UTF8String.fromString) match {
      case Nil => None
      case vs => Some((vs.reduce((a, b) => if (a.compareTo(b) <= 0) a else b),
        vs.reduce((a, b) => if (a.compareTo(b) >= 0) a else b)))
    })

  test("property: stats blob encode/decode round-trips exact bounds (incl. control chars, NaN)") {
    samples(statRowGen, 8).foreach { rows =>
      val fs = LakeSinkStats.decode(trackedBlob(rows), statSchema)
      Seq("l", "d", "s").zip(expectedBounds(rows)).foreach { case (c, want) =>
        fs.get(c) match {
          case Some(LakeSinkStats.ColStat(n, Some((lo, hi)), _, _, _)) =>
            val Some((wl, wh)) = want
            assert(LakeSinkStats.cmp(lo, wl) == 0 && LakeSinkStats.cmp(hi, wh) == 0,
              s"$c: got [$lo,$hi] want [$wl,$wh]")
            assert(n.contains(nullCountOf(rows, c)), s"$c: null count $n")
          case Some(LakeSinkStats.ColStat(n, None, _, _, _)) =>
            assert(want.isEmpty, s"$c: all-null marker but values exist")
            assert(n.contains(nullCountOf(rows, c)), s"$c: null count $n")
          case None => fail(s"$c: column missing from blob")
        }
      }
    }
  }

  test("property: mergeBlobs equals the blob of the concatenation (hull law)") {
    samples(statRowGen, 6).foreach { rows =>
      val (a, b) = rows.splitAt(rows.length / 2)
      val merged = LakeSinkStats.decode(
        LakeSinkStats.mergeBlobs(Seq(trackedBlob(a), trackedBlob(b)), statSchema),
        statSchema)
      val whole = LakeSinkStats.decode(trackedBlob(rows), statSchema)
      Seq("l", "d", "s").foreach { c =>
        (merged.get(c), whole.get(c)) match {
          case (Some(LakeSinkStats.ColStat(mn, Some((ml, mh)), _, _, _)),
                Some(LakeSinkStats.ColStat(wn, Some((wl, wh)), _, _, _))) =>
            assert(LakeSinkStats.cmp(ml, wl) == 0 && LakeSinkStats.cmp(mh, wh) == 0,
              s"$c: merged [$ml,$mh] vs whole [$wl,$wh]")
            assert(mn == wn, s"$c: merged null count $mn vs whole $wn (sum law)")
          case (m, w) => assert(m.map(_.bounds.isEmpty) == w.map(_.bounds.isEmpty) &&
            m.flatMap(_.nulls) == w.flatMap(_.nulls),
            s"$c: merged $m vs whole $w")
        }
      }
    }
  }

  test("property: histogram fold equals the histogram of the concatenation") {
    // aligned-grid law: union(parts) and whole-tracking agree once both
    // are coarsened to the coarser of the two grids (coarsening order is
    // adaptive, so the grids may differ — the COUNTS at a common grid may
    // not: nesting makes every coarsen an exact pairwise merge)
    def blobHist(rows: Seq[(Option[Long], Option[Double], Option[String])]): String = {
      val ts = LakeSinkStats.trackers(statSchema, histCols = Set("l", "d"))
      rows.foreach { case (l, d, t) =>
        val row = new GenericInternalRow(Array[Any](
          l.map(Long.box).orNull, d.map(Double.box).orNull,
          t.map(UTF8String.fromString).orNull))
        (0 to 2).foreach(i =>
          if (row.isNullAt(i)) ts(i).get.nullSeen() else ts(i).get.update(row, i))
      }
      LakeSinkStats.blobOf(ts)
    }
    def at(j: Int, h: (Int, Seq[(Long, Long)])): Seq[(Long, Long)] = {
      require(j >= h._1)
      def sh(m: Long, s: Int): Long = // past the JVM shift mask
        if (s >= 63) (if (m < 0) -1L else 0L) else m >> s
      h._2.groupBy { case (m, _) => sh(m, j - h._1) }
        .map { case (k, v) => k -> v.map(_._2).sum }.toSeq.sortBy(_._1)
    }
    samples(statRowGen, 6).foreach { rows =>
      val (a, b) = rows.splitAt(rows.length / 2)
      val merged = LakeSinkStats.decode(
        LakeSinkStats.mergeBlobs(Seq(blobHist(a), blobHist(b)), statSchema),
        statSchema)
      val whole = LakeSinkStats.decode(blobHist(rows), statSchema)
      Seq("l", "d").foreach { c =>
        (merged.get(c).flatMap(_.hist), whole.get(c).flatMap(_.hist)) match {
          case (Some(m), Some(w)) =>
            val j = math.max(m._1, w._1)
            assert(at(j, m) == at(j, w),
              s"$c: folded histogram differs from whole-tracking at grid $j")
            // counts conserve the non-null row count
            val nonNull = rows.count(r =>
              (if (c == "l") r._1.isDefined else r._2.isDefined))
            assert(w._2.map(_._2).sum == nonNull.toLong ||
              // doubles: NaN/Inf values are excluded from the axis
              c == "d",
              s"$c: histogram mass ${w._2.map(_._2).sum} vs $nonNull rows")
          case (m, w) =>
            assert(m.isEmpty == w.isEmpty, s"$c: hist presence $m vs $w")
        }
      }
    }
  }

  test("histUnion survives grid gaps past the JVM shift mask (>= 64 levels)") {
    // a sub-unit double file (j = -20) folded with an epoch-magnitude
    // file (j = 50): the 70-level re-grid shift would be masked to 6
    // bits by a bare >> and land counts in garbage buckets (review r14)
    val fine = (-20, Seq((1000L, 5L)))   // values ~0.00095 -> bucket 0 at j=50
    val coarse = (50, Seq((3L, 7L)))
    val Some((j, buckets)) = LakeSinkStats.histUnion(Seq(fine, coarse))
    assert(j == 50 && buckets == Seq((0L, 5L), (3L, 7L)), s"$j $buckets")
    // negative indices collapse to the sign bucket, not garbage
    val neg = (-20, Seq((-1000L, 4L)))
    val Some((j2, b2)) = LakeSinkStats.histUnion(Seq(neg, coarse))
    assert(j2 == 50 && b2 == Seq((-1L, 4L), (3L, 7L)), s"$j2 $b2")
  }

  test("property: ndv register fold equals the registers of the concatenation") {
    // trackedBlob with registers on every column: the merge of two parts'
    // registers must BIT-EQUAL the registers of tracking the whole — the
    // elementwise-max law that makes per-file NDV estimates exact for any
    // pruned file subset (and keeps compaction's arithmetic fold honest)
    def blobNdv(rows: Seq[(Option[Long], Option[Double], Option[String])]): String = {
      val ts = LakeSinkStats.trackers(statSchema, ndvCols = Set("l", "d", "s"))
      rows.foreach { case (l, d, t) =>
        val row = new GenericInternalRow(Array[Any](
          l.map(Long.box).orNull, d.map(Double.box).orNull,
          t.map(UTF8String.fromString).orNull))
        (0 to 2).foreach(i =>
          if (row.isNullAt(i)) ts(i).get.nullSeen() else ts(i).get.update(row, i))
      }
      LakeSinkStats.blobOf(ts)
    }
    samples(statRowGen, 6).foreach { rows =>
      val (a, b) = rows.splitAt(rows.length / 2)
      val merged = LakeSinkStats.decode(
        LakeSinkStats.mergeBlobs(Seq(blobNdv(a), blobNdv(b)), statSchema),
        statSchema)
      val whole = LakeSinkStats.decode(blobNdv(rows), statSchema)
      Seq("l", "d", "s").foreach { c =>
        (merged.get(c).flatMap(_.ndv), whole.get(c).flatMap(_.ndv)) match {
          case (Some(m), Some(w)) =>
            assert(java.util.Arrays.equals(m, w),
              s"$c: folded registers differ from whole-tracking registers")
          case (m, w) =>
            // both absent only when the column is all-null in a part AND
            // the whole (no registers attach to empty bounds)
            assert(m.isEmpty == w.isEmpty, s"$c: ndv presence $m vs $w")
        }
      }
      // and the estimate of a known-cardinality set is within 10%
      val vals = (0 until 2000).map(i =>
        (Some(i.toLong % 700): Option[Long], None: Option[Double],
          None: Option[String]))
      val est = LakeSinkStats.decode(blobNdv(vals), statSchema)
        .get("l").flatMap(_.ndv).map(LakeSinkStats.ndvEstimate).get
      assert(math.abs(est - 700L).toDouble / 700.0 <= 0.10, s"estimate $est vs 700")
    }
  }

  test("mayMatch treats signed zeros as equal (Spark IEEE == semantics)") {
    import org.apache.spark.sql.sources._
    // Spark evaluates d = -0.0 with IEEE ==, where -0.0 == 0.0 — a file
    // whose tracked bounds are [0.0, 0.0] MUST stay; raw Double.compare
    // would order -0.0 < lo and prune it (silent row loss)
    val posZero = Some(LakeSinkStats.decode(
      trackedBlob(Seq((None, Some(0.0), None))), statSchema))
    val negZero = Some(LakeSinkStats.decode(
      trackedBlob(Seq((None, Some(-0.0), None))), statSchema))
    assert(LakeSinkStats.mayMatch(posZero, statSchema, EqualTo("d", -0.0)),
      "d = -0.0 must keep a file with bounds [0.0, 0.0]")
    assert(LakeSinkStats.mayMatch(negZero, statSchema, EqualTo("d", 0.0)),
      "d = 0.0 must keep a file with bounds [-0.0, -0.0]")
    assert(LakeSinkStats.mayMatch(negZero, statSchema, GreaterThanOrEqual("d", 0.0)))
    assert(LakeSinkStats.mayMatch(posZero, statSchema, LessThanOrEqual("d", -0.0)))
    // and the comparator itself is Spark's (SQLOrderingUtil.compareDoubles)
    assert(LakeSinkStats.cmp(Double.box(-0.0), Double.box(0.0)) == 0)
    assert(LakeSinkStats.cmp(Double.box(Double.NaN), Double.box(Double.NaN)) == 0)
    assert(LakeSinkStats.cmp(Double.box(1.0), Double.box(Double.NaN)) < 0)
  }

  test("streaming offset json round-trips paths with whitespace/control chars") {
    // jsonEscape emits \n/\r/\t/\uXXXX — fromJson must invert ALL of them
    // or a checkpointed offset stops matching committed() paths
    val nasty = Seq("/lake/plain/part-e0-0.json.gz",
      "/lake/with space/part \n tab\t\r.json.gz",
      "/lake/ctl/quote\"back\\slash.json.gz")
    val off = graft.sources.LakeSinkOffset(nasty)
    assert(graft.sources.LakeSinkOffset.fromJson(off.json()).files == nasty)
    assert(graft.sources.LakeSinkOffset.fromJson(
      graft.sources.LakeSinkOffset(Seq.empty).json()).files.isEmpty)
  }

  test("property: mayMatch is SOUND — a skipped file truly has no matching value") {
    import org.apache.spark.sql.sources._
    val litGen: Gen[(String, Any)] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(v => ("l", v: Any)),
      Gen.chooseNum(-1e9, 1e9).map(v => ("d", v: Any)),
      statStrGen.map(v => ("s", v: Any)))
    samples(Gen.zip(statRowGen, Gen.listOfN(12, litGen)), 6).foreach { case (rows, lits) =>
      val fs = Some(LakeSinkStats.decode(trackedBlob(rows), statSchema))
      def colVals(c: String): Seq[Any] = c match {
        case "l" => rows.flatMap(_._1).map(Long.box)
        case "d" => rows.flatMap(_._2).map(Double.box)
        case "s" => rows.flatMap(_._3).map(UTF8String.fromString)
      }
      def comp(c: String, w: Any): Any = c match {
        case "s" => UTF8String.fromString(w.asInstanceOf[String])
        case _   => w
      }
      lits.foreach { case (c, w) =>
        val filters: Seq[(Filter, Any => Boolean)] = Seq(
          (EqualTo(c, w), (v: Any) => LakeSinkStats.cmp(v, comp(c, w)) == 0),
          (GreaterThan(c, w), (v: Any) => LakeSinkStats.cmp(v, comp(c, w)) > 0),
          (GreaterThanOrEqual(c, w), (v: Any) => LakeSinkStats.cmp(v, comp(c, w)) >= 0),
          (LessThan(c, w), (v: Any) => LakeSinkStats.cmp(v, comp(c, w)) < 0),
          (LessThanOrEqual(c, w), (v: Any) => LakeSinkStats.cmp(v, comp(c, w)) <= 0),
          (IsNotNull(c), (_: Any) => true))
        filters.foreach { case (f, pred) =>
          if (!LakeSinkStats.mayMatch(fs, statSchema, f))
            assert(!colVals(c).exists(pred),
              s"UNSOUND SKIP: $f pruned a file containing a matching value " +
                s"(values=${colVals(c).take(5)}...)")
        }
        // IsNull soundness: a skip proves the file holds ZERO nulls
        if (!LakeSinkStats.mayMatch(fs, statSchema, IsNull(c)))
          assert(nullCountOf(rows, c) == 0L,
            s"UNSOUND SKIP: IsNull($c) pruned a file containing nulls")
      }
    }
  }

  test("property: bloom skip is SOUND — a skipped file provably lacks the needle") {
    import graft.sources.LakeSinkStats
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.unsafe.types.UTF8String
    // SMALL filters (512 bits) on dense random inputs — saturation must
    // only cost effectiveness, never soundness
    samples(statRowGen, 6).foreach { rows =>
      val ts = LakeSinkStats.trackers(statSchema,
        Map("l" -> 512, "s" -> 512, "d" -> 512))
      rows.foreach { case (l, d, t) =>
        val row = new GenericInternalRow(Array[Any](
          l.map(Long.box).orNull, d.map(Double.box).orNull,
          t.map(UTF8String.fromString).orNull))
        (0 to 2).foreach(i =>
          if (row.isNullAt(i)) ts(i).get.nullSeen() else ts(i).get.update(row, i))
      }
      val fs = LakeSinkStats.decode(LakeSinkStats.blobOf(ts), statSchema)
      // no false negatives: every INSERTED value must pass EqualTo
      rows.flatMap(_._1).foreach { v =>
        assert(LakeSinkStats.mayMatch(Some(fs), statSchema, EqualTo("l", v)),
          s"UNSOUND: bloom dropped inserted long $v")
      }
      rows.flatMap(_._3).foreach { v =>
        assert(LakeSinkStats.mayMatch(Some(fs), statSchema, EqualTo("s", v)),
          s"UNSOUND: bloom dropped inserted string '$v'")
      }
      // a double column never carries a filter (no fp for IEEE values):
      // inserted doubles must still pass through the bounds-only path
      rows.flatMap(_._2).filterNot(_.isNaN).foreach { v =>
        assert(LakeSinkStats.mayMatch(Some(fs), statSchema, EqualTo("d", v)))
      }
    }
    // effectiveness (deterministic inputs): an ABSENT needle strictly
    // inside the [lo, hi] bounds skips via the filter — the case bounds
    // alone can never serve
    val ts = LakeSinkStats.trackers(statSchema, Map("l" -> 65536))
    (0 until 100).foreach { i =>
      val row = new GenericInternalRow(Array[Any](Long.box(2L * i), null, null))
      ts(0).get.update(row, 0); ts(1).get.nullSeen(); ts(2).get.nullSeen()
    }
    val fs = LakeSinkStats.decode(LakeSinkStats.blobOf(ts), statSchema)
    assert(LakeSinkStats.mayMatch(Some(fs), statSchema, EqualTo("l", 42L)),
      "inserted even needle must pass")
    assert(!LakeSinkStats.mayMatch(Some(fs), statSchema, EqualTo("l", 99L)),
      "absent odd needle inside the bounds must skip via the bloom")
  }

  test("property: temporal transform laws — key/dir/interval agree on arbitrary micros") {
    import graft.sources.LakePart
    // micros spanning 1969..2100 (negative epochs included: floorDiv and
    // the proleptic calendar must agree below zero too)
    val microsGen = Gen.listOfN(60,
      Gen.chooseNum(-50000000000000L, 4200000000000000L))
    samples(microsGen, 5).foreach { ms =>
      ms.foreach { m =>
        LakePart.TemporalKinds.foreach { kind =>
          val dir = LakePart.temporalDirValue(kind, m)
          // 1. the dir value round-trips to the SPJ key of the raw micros
          assert(LakePart.temporalKeyOfDir(kind, dir) ==
            LakePart.temporalKey(kind, m),
            s"$kind($m): dir '$dir' key mismatch")
          // 2. the pruning interval CONTAINS the micros (soundness: a file
          // can never be pruned away from a predicate its rows satisfy)
          val (lo, hi) = LakePart.temporalDirInterval(kind, dir)
          assert(lo <= m && m <= hi, s"$kind($m): $m outside [$lo,$hi] of '$dir'")
          // 3. interval edges map back into the same dir (tightness)
          assert(LakePart.temporalDirValue(kind, lo) == dir &&
            LakePart.temporalDirValue(kind, hi) == dir,
            s"$kind: interval edges of '$dir' escape the dir")
          // 4. one past either edge leaves the dir (exactness)
          assert(LakePart.temporalDirValue(kind, lo - 1) != dir &&
            LakePart.temporalDirValue(kind, hi + 1) != dir,
            s"$kind: interval of '$dir' is not maximal")
        }
      }
    }
  }
}
