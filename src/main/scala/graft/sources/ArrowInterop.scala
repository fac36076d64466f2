package graft.sources

import java.io.{ByteArrayOutputStream, File, FileInputStream, FileOutputStream}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC interop (SURVEY §2 #15 source/sink surface; reference:
  * arrow-interop/src/record_batch_convert.rs and
  * examples/python_usage.py `to_pandas()`).
  *
  * The reference exchanges Arrow RecordBatches zero-copy with
  * pandas/polars. The Spark-native analogue is the Arrow IPC *stream
  * format* at the library boundary:
  *
  *  - [[writeIpc]]: each PARTITION writes one `.arrow` stream file —
  *    a distributed sink (no driver collect), batched columnar
  *    conversion; any pyarrow/polars/pandas client reads the directory
  *    directly (`pyarrow.ipc.open_stream`).
  *  - [[readIpc]]: the matching distributed source — one task per file.
  *  - [[collectIpcBytes]]: single in-memory IPC stream on the driver —
  *    the deliberate driver-side materialization `to_pandas()` is; use
  *    only for final, small results.
  *
  * Supported column types: the reference engine's surface (int32/64,
  * float32/64, utf8, binary, bool, timestamp-µs-UTC) plus `array<T>`
  * of any supported element type (Arrow List, nesting included) — the
  * engine's own embeddings (`array<float>`) and token arrays
  * round-trip through IPC like every scalar column.
  */
object ArrowInterop {

  val DefaultBatchSize = 4096

  // The java.io.File-based commit protocol (driver-side cleanup +
  // _SUCCESS, executor-side part writes) only composes on a POSIX
  // path visible to every node. URI-schemed paths (hdfs://, s3a://)
  // would silently scatter parts — reject them up front.
  private def requireLocalPath(dir: String): Unit =
    require(!dir.contains("://"),
      s"ArrowInterop requires a plain filesystem path shared by all nodes; " +
        s"got URI-schemed '$dir' (use parquet for hdfs/s3 targets)")

  private def arrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      // array<T> → Arrow List with one child field (named "item" per the
      // pyarrow convention). Recursion covers array<array<T>> for free —
      // the child of a ListVector is itself a FieldVector.
      case ArrayType(elem, containsNull) =>
        new Field(name, new FieldType(nullable, new ArrowType.List, null),
          java.util.Collections.singletonList(arrowField("item", elem, containsNull)))
      case _ =>
        val t: ArrowType = dt match {
          case LongType => new ArrowType.Int(64, true)
          case IntegerType => new ArrowType.Int(32, true)
          case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
          case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
          case StringType => new ArrowType.Utf8
          case BinaryType => new ArrowType.Binary
          case BooleanType => new ArrowType.Bool
          case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
          case TimestampNTZType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, null)
          case other => throw new IllegalArgumentException(
            s"ArrowInterop: unsupported type $other for column $name")
        }
        new Field(name, new FieldType(nullable, t, null), java.util.Collections.emptyList())
    }

  private def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(f => arrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)

  private def tsMicros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  private def setCell(v: FieldVector, idx: Int, value: Any): Unit = value match {
    case null => v match {
      case lv: org.apache.arrow.vector.complex.ListVector => lv.setNull(idx)
      case fv: BaseFixedWidthVector => fv.setNull(idx)
      case vv: BaseVariableWidthVector => vv.setNull(idx)
      case other => throw new IllegalStateException(s"cannot set null on $other")
    }
    // array cell: open the list slot, recurse per element into the child
    // vector (setSafe grows child buffers), close with the element count
    case x: scala.collection.Seq[_] =>
      val lv = v.asInstanceOf[org.apache.arrow.vector.complex.ListVector]
      val start = lv.startNewValue(idx)
      val child = lv.getDataVector.asInstanceOf[FieldVector]
      var i = 0
      x.foreach { e => setCell(child, start + i, e); i += 1 }
      lv.endValue(idx, x.length)
    case x: Long if v.isInstanceOf[TimeStampMicroTZVector] =>
      v.asInstanceOf[TimeStampMicroTZVector].setSafe(idx, x)
    case x: Long => v.asInstanceOf[BigIntVector].setSafe(idx, x)
    case x: Int => v.asInstanceOf[IntVector].setSafe(idx, x)
    case x: Double => v.asInstanceOf[Float8Vector].setSafe(idx, x)
    case x: Float => v.asInstanceOf[Float4Vector].setSafe(idx, x)
    case x: String =>
      v.asInstanceOf[VarCharVector].setSafe(idx, x.getBytes("UTF-8"))
    case x: Array[Byte] => v.asInstanceOf[VarBinaryVector].setSafe(idx, x)
    case x: Boolean => v.asInstanceOf[BitVector].setSafe(idx, if (x) 1 else 0)
    case x: Timestamp =>
      v.asInstanceOf[TimeStampMicroTZVector].setSafe(idx, tsMicros(x))
    case x: java.time.LocalDateTime =>
      v.asInstanceOf[TimeStampMicroVector].setSafe(idx,
        x.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + x.getNano / 1000L)
    case other => throw new IllegalArgumentException(s"unsupported value $other")
  }

  private def getCell(v: FieldVector, idx: Int): Any =
    if (v.isNull(idx)) null
    else v match {
      case x: org.apache.arrow.vector.complex.ListVector =>
        // getObject boxes elements (java.lang.Float/Double/…, Text for
        // utf8); normalize Text → String so Spark's converter accepts it
        x.getObject(idx).asScala.map {
          case t: org.apache.arrow.vector.util.Text => t.toString
          case e => e
        }.toSeq
      case x: BigIntVector => x.get(idx)
      case x: IntVector => x.get(idx)
      case x: Float8Vector => x.get(idx)
      case x: Float4Vector => x.get(idx)
      case x: VarCharVector => new String(x.get(idx), "UTF-8")
      case x: VarBinaryVector => x.get(idx)
      case x: BitVector => x.get(idx) == 1
      case x: TimeStampMicroTZVector =>
        val micros = x.get(idx)
        val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case x: TimeStampMicroVector =>
        val micros = x.get(idx)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(s"unsupported vector $other")
    }

  /** Write rows of one partition as a single Arrow IPC stream. */
  private def writePartition(schema: StructType, rows: Iterator[Row],
      out: java.io.OutputStream, batchSize: Int): Long = {
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    var total = 0L
    try {
      writer.start()
      while (rows.hasNext) {
        root.allocateNew()
        var n = 0
        while (n < batchSize && rows.hasNext) {
          val row = rows.next()
          var c = 0
          while (c < schema.length) {
            setCell(root.getVector(c), n, row.get(c))
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        total += n
      }
      writer.end()
      total
    } finally {
      writer.close(); root.close(); allocator.close()
    }
  }

  /** Distributed sink: one `.arrow` IPC stream file per partition under
    * `dir` (a shared filesystem on a real cluster). No driver collect.
    *
    * Commit protocol: each task writes to an attempt-unique `.tmp` name
    * and atomically renames into place only after a complete stream —
    * task retries and speculative duplicates can never interleave into
    * one file or leave a truncated visible part. A `_SUCCESS` marker is
    * written by the driver once every partition committed, so readers
    * can distinguish a finished directory from a failed job's leftovers. */
  def writeIpc(df: DataFrame, dir: String, batchSize: Int = DefaultBatchSize): Unit = {
    requireLocalPath(dir)
    val schema = df.schema
    val d = new File(dir)
    d.mkdirs()
    // overwrite semantics: invalidate the directory FIRST (drop the old
    // _SUCCESS), then clear every stale part/tmp file — a re-write with
    // fewer partitions must not leave phantom rows from the previous
    // run, and a failed re-write must not leave the old success marker
    new File(d, "_SUCCESS").delete()
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".arrow") || f.getName.endsWith(".tmp"))
      .foreach(_.delete())
    df.foreachPartition { (rows: Iterator[Row]) =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val tmp = new File(dir, f".part-$pid%05d.arrow.attempt-${tc.taskAttemptId()}%d.tmp")
      val out = new FileOutputStream(tmp)
      try {
        writePartition(schema, rows, out, batchSize)
        out.close()
        val dest = new File(dir, f"part-$pid%05d.arrow")
        java.nio.file.Files.move(tmp.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally {
        out.close()
        tmp.delete()
      }
      ()
    }
    new FileOutputStream(new File(dir, "_SUCCESS")).close()
  }

  /** Distributed source: one task per `.arrow` file written by
    * [[writeIpc]] (or any IPC-stream producer with a supported schema).
    *
    * By default requires the `_SUCCESS` marker [[writeIpc]] leaves after
    * every partition committed, so a failed job's partial directory is
    * rejected instead of read as complete. Pass
    * `requireSuccessMarker = false` for directories produced by an
    * external IPC writer that uses no marker. */
  def readIpc(spark: SparkSession, dir: String,
      requireSuccessMarker: Boolean = true): DataFrame = {
    requireLocalPath(dir)
    require(!requireSuccessMarker || new File(dir, "_SUCCESS").exists(),
      s"$dir has no _SUCCESS marker — the writing job did not finish " +
        "(pass requireSuccessMarker = false to read anyway)")
    // listFiles is null (not empty) for a missing/unreadable directory
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .arrow files under $dir")
    val schema = {
      val allocator = new RootAllocator()
      val in = new FileInputStream(files.head)
      val reader = new ArrowStreamReader(in, allocator)
      try sparkSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); in.close(); allocator.close() }
    }
    val expectedSchema = schema
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { path =>
        // stream batch-by-batch: peak task memory is ONE Arrow batch,
        // not the whole file inflated into Row objects
        val allocator = new RootAllocator()
        val in = new FileInputStream(path)
        val reader = new ArrowStreamReader(in, allocator)
        val root = reader.getVectorSchemaRoot
        // every file must carry the schema inferred from the first one —
        // fail with the file name, not a decode error rows later
        val fileSchema = sparkSchema(root.getSchema)
        require(fileSchema == expectedSchema,
          s"$path schema $fileSchema differs from ${files.head}'s $expectedSchema")
        val nCols = root.getSchema.getFields.size()
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; reader.close(); in.close(); allocator.close()
        }
        // a limit()/failure can abandon the iterator mid-file: the task
        // completion listener releases the fd + off-heap Arrow buffers
        // that the exhaustion path would otherwise never reach
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        new Iterator[Row] {
          private var rowInBatch = 0
          private var batchRows = 0
          override def hasNext: Boolean = {
            if (closed) return false
            while (rowInBatch >= batchRows) {
              if (!reader.loadNextBatch()) { closeAll(); return false }
              batchRows = root.getRowCount
              rowInBatch = 0
            }
            true
          }
          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException
            val r = Row.fromSeq((0 until nCols).map(c => getCell(root.getVector(c), rowInBatch)))
            rowInBatch += 1
            r
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.List =>
      val child = f.getChildren.get(0)
      ArrayType(sparkType(child), child.isNullable)
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int => IntegerType
    case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.FloatingPoint => DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Bool => BooleanType
    case t: ArrowType.Timestamp =>
      if (t.getTimezone == null) TimestampNTZType else TimestampType
    case other => throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  private def sparkSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.map { f =>
      StructField(f.getName, sparkType(f), f.isNullable)
    }.toSeq)

  /** Driver-side materialization as one IPC stream — the `to_pandas()`
    * analogue. Bounded by driver memory; meant for FINAL small results
    * (the reference's python bridge has the same contract). */
  def collectIpcBytes(df: DataFrame, batchSize: Int = DefaultBatchSize): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writePartition(df.schema, df.toLocalIterator().asScala, out, batchSize)
    out.toByteArray
  }
}
