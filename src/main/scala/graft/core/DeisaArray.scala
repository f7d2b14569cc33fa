package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One block (chunk) of a distributed array — the typed row of a
  * [[DeisaArray]]'s underlying Dataset. `data` is flattened row-major.
  * `pos` is the block's ELEMENT offset inside the global array (grid
  * coordinates are converted at ingest) — this stays well-defined for the
  * irregular block layouts that slicing produces. */
final case class Block(pos: Seq[Int], shape: Seq[Int], data: Array[Double])

/** Small driver-side dense N-D array used by `compute()` results and tests. */
final case class NDArray(shape: Seq[Int], data: Array[Double]) {
  def apply(idx: Int*): Double = data(BlockIndex.linearize(idx.toArray, shape))
  def size: Int = data.length
  def ~==(other: NDArray, tol: Double = 1e-9): Boolean =
    shape == other.shape && data.lazyZip(other.data).forall((a, b) => math.abs(a - b) <= tol)
}

/** Lazy scalar result of a reduction; `compute()` is the action. */
final case class DeisaScalar(df: DataFrame) {
  def compute(): Double = {
    val row = df.first()
    if (row.isNullAt(0))
      throw new IllegalStateException(
        "reduction over an empty array (no blocks matched)")
    row.getDouble(0)
  }
}

/** The engine's user-visible distributed array: a lazy DataFrame of blocks
  * `(pos: array<int>, shape: array<int>, data: array<double>)` plus the
  * global shape and the timestep `t` it belongs to.
  *
  * This is the Spark-native counterpart of the reference's `DeisaArray`
  * (a dask.array.Array subclass carrying `.t`, deisa-ray `types.py:206-269`):
  * operations build Catalyst expressions (codegen'd higher-order functions
  * over the flattened block data) or block-level kernels; nothing executes
  * until `compute()` / a sink. Elementwise array⊗array ops are equi-joins on
  * chunk position — the same alignment contract dask imposes.
  */
final case class DeisaArray(
    df: DataFrame,
    globalShape: Seq[Int],
    t: Long,
    name: String = "array",
    dtype: String = "float64",
    dims: Seq[String] = Seq.empty
) {
  import org.apache.spark.sql.Column

  require(dims.isEmpty || dims.length == globalShape.length,
    s"dims $dims must name every axis of $globalShape")

  def spark: SparkSession = df.sparkSession
  def numElements: Long = globalShape.map(_.toLong).product

  /** Name the axes (xarray-style, C20): propagated through shape-preserving
    * ops, permuted by transpose, dropped by axis reductions, and persisted
    * by the sinks (manifest `dims`, zarr `.zattrs` `_ARRAY_DIMENSIONS`). */
  def withDims(names: Seq[String]): DeisaArray = copy(dims = names)

  /** Resolve an axis by its name (requires dims to be set). */
  def axisOf(dim: String): Int = {
    val i = dims.indexOf(dim)
    require(i >= 0, s"unknown dim '$dim' (dims: $dims)")
    i
  }

  private def withData(f: Column => Column): DeisaArray =
    copy(df = df.select(col("pos"), col("shape"), f(col("data")).as("data")))

  // ---- C5/C10/C11/C12: elementwise (codegen'd transform over block data) ----

  def elementwise(f: Column => Column): DeisaArray =
    withData(d => transform(d, f))

  def *(s: Double): DeisaArray = elementwise(_ * lit(s))
  def +(s: Double): DeisaArray = elementwise(_ + lit(s))
  def -(s: Double): DeisaArray = elementwise(_ - lit(s))
  def /(s: Double): DeisaArray = elementwise(_ / lit(s))

  def clip(lo: Double, hi: Double): DeisaArray =
    elementwise(x => least(greatest(x, lit(lo)), lit(hi)))

  def sqrtElems(): DeisaArray = elementwise(sqrt(_))
  def absElems(): DeisaArray = elementwise(abs(_))
  def powElems(p: Double): DeisaArray = elementwise(pow(_, lit(p)))

  /** da.where(self cmp thresh, self, other) — mask with a scalar fallback. */
  def whereGt(thresh: Double, otherwise: Double): DeisaArray =
    elementwise(x => when(x > lit(thresh), x).otherwise(lit(otherwise)))

  /** Dtype cast with VALUE semantics (numpy astype): integer targets
    * truncate toward zero, float32 rounds through single precision. Block
    * payloads stay physically float64 (the engine's storage type) — the
    * cast constrains the values, the `dtype` tag records the logical type
    * for sinks. In-range values only (numpy's overflow behavior is
    * implementation-defined anyway). */
  def astype(dt: String): DeisaArray = {
    val converted = dt match {
      case "float64" | "f8" | "double" => this
      case "float32" | "f4" | "float" => elementwise(_.cast("float").cast("double"))
      case "int64" | "i8" | "long" => elementwise(_.cast("long").cast("double"))
      case "int32" | "i4" | "int" => elementwise(_.cast("int").cast("double"))
      case "int16" | "i2" | "short" => elementwise(_.cast("short").cast("double"))
      case "int8" | "i1" | "byte" => elementwise(_.cast("byte").cast("double"))
      case other => throw new IllegalArgumentException(s"astype: unsupported dtype '$other'")
    }
    converted.copy(dtype = dt)
  }

  // ---- C6: elementwise array ⊗ array (equi-join on chunk position) ----

  /** Chunk layouts must align (dask's contract too); a full-outer join
    * plus raise_error turns a misaligned combine into a runtime failure
    * instead of silently dropping blocks through an inner join. */
  def combine(other: DeisaArray, f: (Column, Column) => Column): DeisaArray = {
    require(globalShape == other.globalShape,
      s"shape mismatch: $globalShape vs ${other.globalShape}")
    val l = df.select(col("pos"), col("shape"), col("data").as("ldata"))
    val r = other.df.select(col("pos").as("rpos"), col("data").as("rdata"))
    val joined = l.join(r, l("pos") === r("rpos"), "full_outer")
    val guarded = when(col("ldata").isNull || col("rdata").isNull,
      raise_error(concat(lit("combine: chunk layouts are not aligned at position "),
        coalesce(col("pos"), col("rpos")).cast("string"), lit(" — rechunk first"))))
      .otherwise(zip_with(col("ldata"), col("rdata"), f))
    copy(df = joined.select(coalesce(col("pos"), col("rpos")).as("pos"),
      col("shape"), guarded.as("data")))
  }

  def *(other: DeisaArray): DeisaArray = combine(other, _ * _)
  def +(other: DeisaArray): DeisaArray = combine(other, _ + _)
  def -(other: DeisaArray): DeisaArray = combine(other, _ - _)
  def /(other: DeisaArray): DeisaArray = combine(other, _ / _)

  /** Numpy-style broadcast combine with a rank-(n-1) array equal to this
    * shape with `axis` removed (e.g. `arr - arr.mean(axis=0)`).
    *
    * Two physical paths, chosen by the reduced operand's size (known from
    * metadata, no action needed):
    *  - small (fits `broadcastElemLimit` doubles): gather to the driver and
    *    broadcast — one task-side lookup table, zero shuffle;
    *  - large (a wide surviving dimension can be GBs at 100 TB — a driver
    *    gather would bottleneck): distributed equi-join on the surviving
    *    position dims. The reduced operand's chunk grid is the projection
    *    of this array's grid (reduceAxis preserves surviving-dim block
    *    structure), so each block joins exactly its projected counterpart —
    *    the same alignment contract as [[combine]], enforced with a hard
    *    failure on mismatch. */
  def combineBroadcast(other: DeisaArray, axis: Int,
      f: (Double, Double) => Double,
      broadcastElemLimit: Long = 4L << 20): DeisaArray = {
    val expected = globalShape.indices.filter(_ != axis).map(globalShape)
    require(other.globalShape == expected,
      s"broadcast shape ${other.globalShape} incompatible with $globalShape minus axis $axis")
    val ax = axis
    import df.sparkSession.implicits._
    if (other.numElements <= broadcastElemLimit) {
      val small = other.compute()
      val bc = spark.sparkContext.broadcast(small)
      val out = df.as[Block].map { b =>
        val sm = bc.value
        val shape = b.shape
        val data = new Array[Double](b.data.length)
        var i = 0
        while (i < data.length) {
          val li = BlockIndex.delinearize(i, shape)
          val oIdx = li.indices.filter(_ != ax)
            .map(d => li(d) + b.pos(d)).toArray
          data(i) = f(b.data(i), sm.data(BlockIndex.linearize(oIdx, sm.shape)))
          i += 1
        }
        Block(b.pos, b.shape, data)
      }
      copy(df = out.toDF())
    } else {
      // distributed path: key = position projected onto the surviving dims.
      // Blocks stacked along `axis` share a key, so the join replicates each
      // reduced block once per stacked source block — exactly the data
      // movement required, shuffled instead of driver-gathered.
      val l = df.select(col("pos"), col("shape"), col("data"))
        .withColumn("jkey", filter(col("pos"), (_, i) => i =!= lit(ax)))
      val r = other.df.select(col("pos").as("jkey"),
        col("shape").as("oshape"), col("data").as("odata"))
      val joined = l.join(r, Seq("jkey"), "full_outer")
        .select(col("pos"), col("shape"), col("data"), col("oshape"), col("odata"))
        .as[(Seq[Int], Seq[Int], Array[Double], Seq[Int], Array[Double])]
      val out = joined.map { case (pos, shape, data, oshape, odata) =>
        if (pos == null || odata == null)
          throw new IllegalStateException(
            "combineBroadcast: chunk layouts are not aligned (the reduced " +
              "operand's grid is not the projection of this array's grid) — rechunk first")
        val projShape = shape.indices.filter(_ != ax).map(shape)
        if (oshape != projShape)
          throw new IllegalStateException(
            s"combineBroadcast: reduced block shape $oshape != projected $projShape — rechunk first")
        val out = new Array[Double](data.length)
        var i = 0
        while (i < out.length) {
          val li = BlockIndex.delinearize(i, shape)
          val oIdx = li.indices.filter(_ != ax).map(li).toArray
          out(i) = f(data(i), odata(BlockIndex.linearize(oIdx, oshape)))
          i += 1
        }
        Block(pos, shape, out)
      }
      copy(df = out.toDF())
    }
  }

  def minusBroadcast(other: DeisaArray, axis: Int): DeisaArray =
    combineBroadcast(other, axis, _ - _)

  // ---- C1-C4: global reductions (partial per-block, final via Catalyst) ----

  private def blockFold(init: Double, f: (Column, Column) => Column): Column =
    aggregate(col("data"), lit(init), f)

  /** Empty block sets sum to 0, matching numpy's sum of an empty array. */
  def sumScalar(): DeisaScalar =
    DeisaScalar(df.agg(coalesce(sum(blockFold(0.0, _ + _)), lit(0.0)).as("value")))

  /** Order-independent exact sum: per-element cast to Decimal(38, scale)
    * before accumulating, so the result is bit-identical regardless of
    * partitioning — required when cross-checking float sums against an
    * external oracle. */
  def sumScalarExact(scale: Int = 12): DeisaScalar = {
    val dec = org.apache.spark.sql.types.DecimalType(38, scale)
    val perBlock = aggregate(col("data"), lit(0).cast(dec),
      (acc, x) => (acc + x.cast(dec)).cast(dec))
    DeisaScalar(df.agg(sum(perBlock).cast("double").as("value")))
  }

  def minScalar(): DeisaScalar =
    DeisaScalar(df.agg(min(array_min(col("data"))).cast("double").as("value")))

  def maxScalar(): DeisaScalar =
    DeisaScalar(df.agg(max(array_max(col("data"))).cast("double").as("value")))

  def meanScalar(): DeisaScalar =
    DeisaScalar(df.agg(
      (sum(blockFold(0.0, _ + _)) / sum(size(col("data")))).as("value")))

  /** Population std (ddof=0), numpy's default: single-pass sum/sumsq/count
    * partials per block, final combine on the driver side of the agg. */
  def stdScalar(): DeisaScalar = {
    val s = sum(blockFold(0.0, _ + _))
    val sq = sum(aggregate(col("data"), lit(0.0), (acc, x) => acc + x * x))
    val n = sum(size(col("data"))).cast("double")
    DeisaScalar(df.agg(sqrt(sq / n - (s / n) * (s / n)).as("value")))
  }

  // ---- C14: axis reduction (partial in-block kernel + positional regroup) ----

  /** Reduce along `axis` ("sum" | "mean" | "min" | "max"). Partial reduction
    * happens inside each block (map-side), then blocks sharing the same
    * non-reduced position are combined elementwise — one shuffle keyed by the
    * surviving position dims, which is the minimum possible. */
  def reduceAxis(axis: Int, op: String): DeisaArray = {
    require(axis >= 0 && axis < globalShape.length, s"bad axis $axis")
    val (combOp, init) = op match {
      case "sum" | "mean" => ((a: Double, b: Double) => a + b, 0.0)
      case "min" => ((a: Double, b: Double) => math.min(a, b), Double.PositiveInfinity)
      case "max" => ((a: Double, b: Double) => math.max(a, b), Double.NegativeInfinity)
      case other => throw new IllegalArgumentException(s"unknown reduction $other")
    }
    val ax = axis
    import df.sparkSession.implicits._
    val partial = df.as[Block].map { b =>
      val (d, s) = BlockIndex.reduceAxis(b.data, b.shape.toArray, ax, combOp, init)
      Block(b.pos.indices.filter(_ != ax).map(b.pos), s.toIndexedSeq, d)
    }
    // Cross-chunk elementwise combine: shuffle whole partial VECTORS keyed
    // by the surviving position and fold them elementwise — never a row
    // per element (an element-level explode would turn an axis reduction
    // into a full-data shuffle at scale).
    val foldFn: (Column, Column) => Column = op match {
      case "sum" | "mean" => _ + _
      case "min" => (a, b) => least(a, b)
      case "max" => (a, b) => greatest(a, b)
    }
    val combined = DeisaArray.foldBlocks(partial.toDF(), foldFn)
    val newShape = globalShape.indices.filter(_ != ax).map(globalShape)
    val newDims = if (dims.isEmpty) dims else dims.indices.filter(_ != ax).map(dims)
    val result = DeisaArray(combined, newShape, t, name, dtype, newDims)
    if (op == "mean") result / globalShape(ax).toDouble else result
  }

  /** Population std along an axis, composed from axis means:
    * sqrt(E[x²] - E[x]²), numpy ddof=0 semantics. */
  def stdAxis(axis: Int): DeisaArray = {
    val m = reduceAxis(axis, "mean")
    val m2 = powElems(2).reduceAxis(axis, "mean")
    m2.combine(m, (a, b) => sqrt(greatest(a - b * b, lit(0.0))))
  }

  // ---- C7: slicing ----

  /** Sub-array for per-dim [start, stop) ranges (block-level kernel:
    * non-overlapping chunks are filtered out, overlapping ones trimmed). */
  def slice(ranges: Seq[(Int, Int)]): DeisaArray = {
    require(ranges.length == globalShape.length)
    val clamped = ranges.zipWithIndex.map { case ((a, b), i) =>
      val lo = math.max(0, a)
      val hi = math.min(b, globalShape(i))
      require(lo <= hi, s"slice: inverted/out-of-range range ($a, $b) on dim $i of $globalShape")
      (lo, hi)
    }.toArray
    import df.sparkSession.implicits._
    val chunkShapeHint = clamped // captured, serializable
    val sliced = df.as[Block].flatMap { b =>
      BlockIndex.sliceChunk(b.pos.toArray, b.shape.toArray, chunkShapeHint).map {
        case (local, outOff) =>
          val (d, s) = BlockIndex.extract(b.data, b.shape.toArray, local)
          // grid position of the trimmed block inside the sliced result:
          // offset in elements / this block's trimmed extent is irregular in
          // general, so we key blocks by their element offset instead.
          Block(outOff.toIndexedSeq, s.toIndexedSeq, d)
      }
    }
    val newShape = clamped.map { case (a, b) => b - a }.toIndexedSeq
    DeisaArray(sliced.toDF(), newShape, t, name, dtype, dims)
  }

  // ---- C8: transpose ----

  def transpose(axes: Seq[Int]): DeisaArray = {
    require(axes.sorted == globalShape.indices.toList)
    val ax = axes.toArray
    import df.sparkSession.implicits._
    val out = df.as[Block].map { b =>
      val (d, s) = BlockIndex.transposeBlock(b.data, b.shape.toArray, ax)
      Block(ax.map(b.pos).toIndexedSeq, s.toIndexedSeq, d)
    }
    val newDims = if (dims.isEmpty) dims else axes.map(dims)
    DeisaArray(out.toDF(), axes.map(globalShape), t, name, dtype, newDims)
  }

  def T: DeisaArray = transpose(globalShape.indices.reverse)

  // ---- C13: concatenate / rechunk ----

  /** Concatenate along `axis`: a union with position offset arithmetic — no
    * data movement at all, the blocks keep living where they are. */
  def concatenate(others: Seq[DeisaArray], axis: Int): DeisaArray = {
    val all = this +: others
    require(all.forall(a => a.globalShape.indices.filter(_ != axis)
      .forall(i => a.globalShape(i) == globalShape(i))), "non-axis dims must match")
    // offset each input's element offset along `axis` by the extent of the
    // arrays preceding it; pure position arithmetic, no data movement.
    import df.sparkSession.implicits._
    var elemOffset = 0
    val parts = all.map { a =>
      val off = elemOffset
      elemOffset += a.globalShape(axis)
      val ax = axis
      a.df.as[Block].map { b =>
        Block(b.pos.updated(ax, b.pos(ax) + off), b.shape, b.data)
      }
    }
    val unioned = parts.reduce(_ union _)
    val newShape = globalShape.updated(axis,
      all.map(_.globalShape(axis)).sum)
    DeisaArray(unioned.toDF(), newShape, t, name, dtype, dims)
  }

  /** Re-chunk to a new regular chunk shape. One shuffle keyed by target
    * chunk position (same cost class as dask's rechunk). */
  def rechunk(newChunkShape: Seq[Int]): DeisaArray = {
    require(newChunkShape.length == globalShape.length)
    globalShape.lazyZip(newChunkShape).foreach { (g, c) =>
      require(g % c == 0, s"rechunk: $g not divisible by $c") }
    val ncs = newChunkShape.toArray
    val gs = globalShape.toArray
    import df.sparkSession.implicits._
    // split each source block into fragments aligned to target chunks, then
    // reassemble fragments per target chunk.
    val frags = df.as[Block].flatMap { b =>
      val elemOff = b.pos.toArray
      val n = gs.length
      // target chunks overlapped by this block, per dim
      def dimTargets(d: Int): Range =
        (elemOff(d) / ncs(d)) to ((elemOff(d) + b.shape(d) - 1) / ncs(d))
      val dims = (0 until n).map(dimTargets)
      def cross(ds: Seq[Range]): Seq[Array[Int]] = ds match {
        case Seq() => Seq(Array.empty[Int])
        case head +: tail => for (h <- head; rest <- cross(tail)) yield h +: rest
      }
      cross(dims).flatMap { tpos =>
        // intersection of target chunk tpos with this block, in block-local coords
        val local = new Array[(Int, Int)](n)
        val tLocalOff = new Array[Int](n)
        var ok = true
        var d = 0
        while (d < n && ok) {
          val tStart = tpos(d) * ncs(d); val tStop = tStart + ncs(d)
          val lo = math.max(tStart, elemOff(d)); val hi = math.min(tStop, elemOff(d) + b.shape(d))
          if (lo >= hi) ok = false
          else { local(d) = (lo - elemOff(d), hi - elemOff(d)); tLocalOff(d) = lo - tStart }
          d += 1
        }
        if (!ok) None
        else {
          val (d2, s2) = BlockIndex.extract(b.data, b.shape.toArray, local)
          Some((tpos.toIndexedSeq, tLocalOff.toIndexedSeq, s2.toIndexedSeq, d2))
        }
      }
    }.toDF("tpos", "off", "fshape", "fdata")
    // reassemble FRAGMENTS per target chunk (the shuffle carries block
    // fragments, never individual elements) and place them with a local
    // kernel — the same cost shape as dask's rechunk
    val assembled = frags
      .groupBy(col("tpos"))
      .agg(collect_list(struct(col("off"), col("fshape"), col("fdata"))).as("parts"))
      .as[(Seq[Int], Seq[(Seq[Int], Seq[Int], Array[Double])])]
      .map { case (tpos, parts) =>
        val out = new Array[Double](ncs.product)
        parts.foreach { case (off, fshape, fdata) =>
          var i = 0
          while (i < fdata.length) {
            val li = BlockIndex.delinearize(i, fshape)
            val tIdx = li.indices.map(d => li(d) + off(d)).toArray
            out(BlockIndex.linearize(tIdx, ncs.toIndexedSeq)) = fdata(i)
            i += 1
          }
        }
        Block(tpos.lazyZip(ncs.toIndexedSeq).map(_ * _), ncs.toIndexedSeq, out)
      }
    DeisaArray(assembled.toDF(), globalShape, t, name, dtype, dims)
  }

  // ---- C17/C18: persist / compute ----

  def persist(): DeisaArray = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    copy(df = p)
  }

  def unpersist(): DeisaArray = { df.unpersist(); this }

  /** Action: gather all blocks and assemble the dense array on the driver.
    * Only for small results / tests — production paths end in sinks. */
  def compute(): NDArray = {
    val blocks = df.select(col("pos"), col("shape"), col("data")).collect()
    val out = new Array[Double](numElements.toInt)
    val gs = globalShape
    blocks.foreach { r =>
      val elemOff = r.getSeq[Int](0).toArray
      val shape = r.getSeq[Int](1).toArray
      val data = r.getSeq[Double](2).toArray
      var i = 0
      while (i < data.length) {
        val li = BlockIndex.delinearize(i, shape.toIndexedSeq)
        val gi = li.indices.map(d => li(d) + elemOff(d)).toArray
        out(BlockIndex.linearize(gi, gs)) = data(i)
        i += 1
      }
    }
    NDArray(gs, out)
  }
}

object DeisaArray {
  /** Elementwise fold of equal-shape blocks sharing a position: one
    * shuffle of whole data vectors + a zip_with fold — the block-sum
    * primitive for matmul partials and axis reductions. */
  private[graft] def foldBlocks(blocks: DataFrame,
      f: (Column, Column) => Column): DataFrame =
    blocks.groupBy(col("pos"))
      .agg(collect_list(col("shape")).as("shapes"),
        collect_list(col("data")).as("parts"))
      .select(col("pos"),
        // partials at one position must agree on shape — differently
        // chunked inputs would otherwise overlap silently
        when(size(array_distinct(col("shapes"))) > 1,
          raise_error(concat(lit("foldBlocks: mismatched block shapes at position "),
            col("pos").cast("string"), lit(" — rechunk first"))))
          .otherwise(element_at(col("shapes"), 1)).as("shape"),
        // fold from the first vector (identity-free: works for sum AND
        // min/max without inventing a neutral element)
        aggregate(
          slice(col("parts"), lit(2), greatest(size(col("parts")) - 1, lit(0))),
          element_at(col("parts"), 1),
          (acc, x) => zip_with(acc, x, f)).as("data"))

  /** Build from in-memory chunks (test fixtures; mirrors the reference's
    * closed-form test arrays). */
  def fromChunks(spark: SparkSession, chunks: Seq[ChunkRow],
      meta: ArrayMeta, t: Long): DeisaArray = {
    import spark.implicits._
    // grid coordinates → element offsets (the engine's internal convention)
    val blocks = chunks.map(c =>
      Block(c.pos.lazyZip(c.shape).map(_ * _), c.shape, c.data))
    DeisaArray(spark.createDataset(blocks).toDF(), meta.globalShape, t,
      meta.name, chunks.headOption.map(_.dtype).getOrElse("float64"))
  }

  /** Assemble the per-timestep array from a DataFrame of ChunkRows
    * (the scan: SURVEY §2.B — in Spark a filter on (name, t), already
    * partitioned by position). Grid coords become element offsets here.
    * Rows are shape-validated in the plan — on the streaming path no
    * driver-side code sees individual chunks, so the contract check rides
    * with the scan (reference `validate.py` semantics). */
  def fromChunkRows(chunkRows: DataFrame, meta: ArrayMeta, t: Long,
      dtype: String = "float64"): DeisaArray = {
    val declaredShape = lit(meta.chunkShape.toArray)
    val checkedData = when(
      col("shape") =!= declaredShape ||
        size(col("data")) =!= lit(meta.chunkShape.product),
      raise_error(concat(
        lit(s"ContractError: chunk for '${meta.name}' violates declared shape "),
        col("shape").cast("string")))).otherwise(col("data"))
    val df = chunkRows
      .filter(col("name") === meta.name && col("t") === t)
      .select(
        zip_with(col("pos"), col("shape"), (p, s) => p * s).as("pos"),
        col("shape"), checkedData.as("data"))
    DeisaArray(df, meta.globalShape, t, meta.name, dtype)
  }
}
