package graft.ops
import graft.QueryDef
object SimilarityQueries { val defs: Seq[QueryDef] = Seq() }
