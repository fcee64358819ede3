package graft.sources

/** Shared scaffold for LAZY single-file frame iterators ([[TfRecordIO]]
  * records, [[TarShardIO]] members — r14 review: the two containers had
  * grown byte-identical copies of this machinery): opens the file,
  * tracks the read position, closes exactly once — at clean EOF, at the
  * first terminal defect, or on task completion (downstream
  * `limit`/failure) — and drives the pending-slot Iterator protocol so
  * memory stays O(one frame), never O(file).
  *
  * Implementations supply [[parseFrame]] only: parse ONE frame at `pos`
  * (advancing it), return the row; return `null` at clean EOF and call
  * [[closeStream]] there and on any terminal defect (a quarantine row is
  * emitted first, then the stream is dead).
  */
private[sources] abstract class FrameStream[T >: Null <: AnyRef](
    val file: String,
    conf: org.apache.spark.util.SerializableConfiguration)
  extends Iterator[T] {

  protected val path = new org.apache.hadoop.fs.Path(file)
  private val fs = path.getFileSystem(conf.value)
  protected val fileSize: Long = fs.getFileStatus(path).getLen
  protected val in: org.apache.hadoop.fs.FSDataInputStream = fs.open(path)
  protected var pos: Long = 0L
  private var done = false
  private var pending: T = null

  locally {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeStream())
  }

  protected def closeStream(): Unit = if (!done) { done = true; in.close() }

  /** Parse ONE frame; null = exhausted (close the stream there). */
  protected def parseFrame(): T

  final override def hasNext: Boolean = {
    if (pending == null && !done) pending = parseFrame()
    pending != null
  }

  final override def next(): T = {
    if (!hasNext) throw new NoSuchElementException(file)
    val r = pending
    pending = null
    r
  }
}
