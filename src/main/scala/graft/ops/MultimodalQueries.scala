package graft.ops
import graft.QueryDef
object MultimodalQueries { val defs: Seq[QueryDef] = Seq() }
