package graft.ops
import graft.QueryDef
object TextQueries { val defs: Seq[QueryDef] = Seq() }
