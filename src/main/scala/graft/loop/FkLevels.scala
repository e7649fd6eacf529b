package graft.loop

/** FK-dependency levels: tables are applied level-by-level so a child's
  * parents exist before the child's rows land — the engine's analog of the
  * reference's recursive-CTE depth computation and level-ordered flush
  * (reference: internal/target/schemawatch/dependencies.go:54-110;
  * internal/source/cdc/resolver.go:375-386; types.go:219-228).
  *
  * The metadata is tiny (a handful of tables), so this is plain driver-side
  * Scala: a longest-path-from-roots layering over the parent edges.
  */
object FkLevels {

  /** @param dependsOn child -> set of parent tables (FK targets)
    * @return tables grouped by depth: level 0 has no parents, level N
    *         depends only on tables in levels < N. Tables within one level
    *         can be applied in parallel.
    * @throws IllegalArgumentException on a dependency cycle
    */
  def levels(
      tables: Seq[String],
      dependsOn: Map[String, Set[String]]
  ): Seq[Seq[String]] = {
    val all = tables.toSet
    val depth = scala.collection.mutable.Map[String, Int]()
    def depthOf(t: String, seen: Set[String]): Int = {
      if (seen.contains(t))
        throw new IllegalArgumentException(
          s"FK dependency cycle involving $t"
        )
      depth.getOrElseUpdate(
        t, {
          val parents = dependsOn.getOrElse(t, Set.empty).filter(all.contains)
          if (parents.isEmpty) 0
          else parents.map(p => depthOf(p, seen + t)).max + 1
        }
      )
    }
    tables.foreach(t => depthOf(t, Set.empty))
    tables
      .groupBy(depth(_))
      .toSeq
      .sortBy(_._1)
      .map(_._2)
  }
}
