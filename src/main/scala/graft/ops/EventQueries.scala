package graft.ops
import graft.QueryDef
object EventQueries { val defs: Seq[QueryDef] = Seq() }
