package graft.io

/** Column-rename lineage for the graft-upsert table format.
  *
  * `ALTER TABLE ... RENAME COLUMN` rewrites the LIVE files under the
  * new name, but immutable history keeps the old one: archived
  * pre-image commits (time travel, change feed) still store the column
  * under every name it ever had. The rename pairs persist in
  * `_table.properties` as `columnRenames = old>new;old2>new2` (append
  * order = rename order), and this helper replays them into a map from
  * each CURRENT column name to its historical names, newest first —
  * exactly what a reader needs to resolve a current-schema projection
  * against an old file ("column mapping" in Delta's vocabulary, by
  * name lineage instead of field ids since parquet files here carry no
  * ids).
  *
  * Dropped-column names persist alongside (`droppedColumns`) so ADD
  * COLUMN / RENAME TO can refuse names that old files still physically
  * store — re-using one would silently resurrect dead values.
  */
object ColumnAliases {

  val RenamesProp = "columnRenames"
  val DroppedProp = "droppedColumns"

  /** current name (lower-cased) → historical names, newest first. */
  def parse(props: Map[String, String]): Map[String, List[String]] = {
    val pairs = props.getOrElse(RenamesProp, "").split(";").toList
      .map(_.trim).filter(_.nonEmpty)
      .map { p =>
        val i = p.indexOf('>')
        require(i > 0 && i < p.length - 1, s"malformed $RenamesProp entry: '$p'")
        (p.substring(0, i), p.substring(i + 1))
      }
    // replay in order: when b renames to c, everything that was
    // historical for b (keyed b) re-keys under c with b prepended
    pairs.foldLeft(Map.empty[String, List[String]]) { case (m, (from, to)) =>
      val hist = m.getOrElse(from.toLowerCase(java.util.Locale.ROOT), Nil)
      (m - from.toLowerCase(java.util.Locale.ROOT)) +
        (to.toLowerCase(java.util.Locale.ROOT) -> (from :: hist))
    }
  }

  /** Every name old files may physically store for columns that no
    * longer exist under it: historical rename sources plus dropped
    * column names. ADD COLUMN / RENAME TO must refuse these.
    */
  def retiredNames(props: Map[String, String]): Set[String] = {
    val dropped = props.getOrElse(DroppedProp, "").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)
    (parse(props).values.flatten.toSeq ++ dropped)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
  }

  /** The serialized `columnRenames` value with one more pair appended. */
  def appendRename(props: Map[String, String], from: String, to: String): String =
    (props.getOrElse(RenamesProp, "").split(";").toSeq
      .map(_.trim).filter(_.nonEmpty) :+ s"$from>$to").mkString(";")

  /** The serialized `droppedColumns` value with one more name appended. */
  def appendDropped(props: Map[String, String], name: String): String =
    (props.getOrElse(DroppedProp, "").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty) :+ name).mkString(",")
}
