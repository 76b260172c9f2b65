package graft.operators

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.types.pojo.Schema
import org.apache.spark.TaskContext

/** Partition-scoped Arrow write machinery for queries that synthesize a
  * REAL Arrow IPC file per row (q261/q273 band).
  *
  * A `RootAllocator` is a heavyweight object: it owns a reference-counted
  * buffer ledger and its teardown walks that ledger. Constructing one (plus
  * a `VectorSchemaRoot` and its backing buffers) PER ROW inside
  * `Dataset.map` is the allocator-churn anti-pattern — on a 60k-row
  * partition that is 60k ledger builds and teardowns whose GC pressure grows
  * with data volume (the round-10 driver bench caught it as a 13x-slower
  * warm re-run). This helper hoists ONE allocator and ONE reusable root to
  * partition scope — the `Multimodal.decodeFeatures` shape — and rows only
  * refill the root's vectors (`allocateNew()` resets buffers in place).
  *
  * Lifecycle: closed via the task-completion listener (covers early
  * termination, e.g. a `limit` stopping the iterator mid-partition); the
  * iterator-exhaustion fallback only exists for driver-local calls where no
  * `TaskContext` is set.
  */
object ArrowSynth {

  /** Maps `rows` with one `RootAllocator` + `VectorSchemaRoot(schema)` for
    * the whole partition. `f` must fully consume the root within the call
    * (serialize it to bytes) — the root is refilled for the next row.
    */
  def mapWithRoot[A, B](rows: Iterator[A], schema: Schema)(
      f: (A, VectorSchemaRoot) => B): Iterator[B] = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    def closeAll(): Unit = {
      try root.close()
      finally alloc.close()
    }
    val ctx = TaskContext.get()
    if (ctx != null) {
      ctx.addTaskCompletionListener[Unit](_ => closeAll())
      rows.map(r => f(r, root))
    } else {
      new Iterator[B] {
        private var closed = false
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !closed) { closed = true; closeAll() }
          h
        }
        def next(): B = f(rows.next(), root)
      }
    }
  }
}
