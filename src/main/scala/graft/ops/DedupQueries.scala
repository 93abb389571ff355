package graft.ops
import graft.QueryDef
object DedupQueries { val defs: Seq[QueryDef] = Seq() }
