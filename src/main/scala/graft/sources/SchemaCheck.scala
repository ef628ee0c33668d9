package graft.sources

import org.apache.spark.sql.types.StructType

/** Schema-drift detection between snapshot generations — the check the
  * reference's orchestrator implicitly relies on (every
  * `data/{customer}/{timestamp}` snapshot must stay loadable by the same
  * node/edge normalization, reference orchestrator.py:226-287): a column
  * silently dropped or retyped between snapshots breaks the downstream
  * load long after the watcher accepted the directory.
  *
  * Pure metadata comparison — runs on the driver against parquet footers
  * (`spark.read.parquet(dir).schema`), never touches data, so it costs
  * the same at 100 TB as at 100 MB.
  */
object SchemaCheck {

  /** One column's type change: (name, expected type, actual type). */
  final case class TypeChange(name: String, expected: String, actual: String)

  final case class Drift(added: Seq[String], removed: Seq[String],
                         typeChanged: Seq[TypeChange]) {
    /** New columns are additive (the normalizers project by position /
      * name and ignore extras); anything removed or retyped is not.
      */
    def isCompatible: Boolean = removed.isEmpty && typeChanged.isEmpty
    def isIdentical: Boolean = isCompatible && added.isEmpty
  }

  /** Diff `actual` against `expected`, matching columns by
    * case-insensitive name (Spark's default resolution).
    */
  def diff(expected: StructType, actual: StructType): Drift = {
    def norm(s: StructType) =
      s.fields.map(f => f.name.toLowerCase -> f).toMap
    val e = norm(expected)
    val a = norm(actual)
    val added = actual.fields.map(_.name).filterNot(n => e.contains(n.toLowerCase))
    val removed = expected.fields.map(_.name).filterNot(n => a.contains(n.toLowerCase))
    val changed = expected.fields.flatMap { f =>
      a.get(f.name.toLowerCase).collect {
        case g if g.dataType != f.dataType =>
          TypeChange(f.name, f.dataType.simpleString, g.dataType.simpleString)
      }
    }
    Drift(added.toSeq, removed.toSeq, changed.toSeq)
  }
}
