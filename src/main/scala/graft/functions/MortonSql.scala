package graft.functions

/** The Morton (z-order) bit-spread as a SQL expression builder, shared
  * by the lake's OPTIMIZE ZORDER write path
  * ([[graft.sources.VersionedTable.compactZOrder]]) and the clustering
  * audit that motivates it (`ScaleOps.clusteringCompare`) — one
  * definition so a bit-width change can never desynchronize the layout
  * writer from the audit that measures it. DuckDB evaluates the same
  * BIGINT `& | <<` algebra, so oracles inline the identical expression.
  */
object MortonSql {

  /** Spread the low 16 bits of integer SQL expression `c` onto the even
    * bit positions (…b2·4 + b1·0… → one empty bit between every input
    * bit) via the standard magic-number doubling. Interleave two
    * spread values as `spread(x) | (spread(y) * 2)` for the Morton key.
    * Sound for inputs in [0, 65535]; callers bucket wider domains first.
    */
  def spread(c: String): String = {
    val a = s"((($c | ($c << 8)) & 16711935))"
    val b = s"((($a | ($a << 4)) & 252645135))"
    s"((($b | ($b << 2)) & 858993459) | ((($b | ($b << 2)) & 858993459) << 1)) & 1431655765"
  }
}
