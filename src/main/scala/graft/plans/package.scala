package graft

/** Custom logical/physical plan nodes — deliberately EMPTY, as a design
  * decision rather than an omission (SURVEY §4, §7.3).
  *
  * The reference's entire relational surface (scan, star join, member
  * filter, group-by/sum, sort, rename — `oec.py:27-66`) lowers onto
  * Catalyst built-ins, which already provide predicate pushdown, column
  * pruning, broadcast selection, partial aggregation, and AQE re-planning.
  * A custom `LogicalPlan`/`SparkStrategy` would duplicate what the
  * optimizer does and would *lose* those properties unless re-implemented.
  *
  * Where built-ins genuinely could not express the hot path, the engine
  * drops one level — to native Catalyst `Expression`s
  * ([[graft.functions.CosineSimilarity]], [[graft.functions.DotProduct]],
  * [[graft.functions.WordShingles]], [[graft.functions.MinHashSig]],
  * [[graft.functions.SimHashSigns]]), a typed `Aggregator`
  * ([[graft.functions.VectorAvg]]), and a DataSource V2 provider
  * ([[graft.sources.OecJsonSource]]) — the narrowest extension points
  * that keep Catalyst in charge of the plan shape.
  *
  * The decision held under pressure: the operators Spark "lacks" turned
  * out to be compositions with the right plan shape already —
  * [[graft.operators.AsOf]] (as-of join = tag-union + window
  * carry-forward: one shuffle, oracle-equal to ANSI ASOF JOIN) and
  * [[graft.operators.RangeJoin]] (banded |Δt| ≤ w proximity join =
  * bucket ±1 replication + shuffle equi-join, never a nested loop).
  *
  * If a future operator needs whole-plan semantics composition cannot
  * express, the intended shape is: logical node + resolution rule +
  * `SparkStrategy` + exec node, registered via `SparkSessionExtensions`
  * — see the project README's scale-design notes.
  */
package object plans
