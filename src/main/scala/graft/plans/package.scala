package graft

/** Custom planner pieces (LogicalPlan / SparkStrategy / SparkPlan). The bar
  * for an operator to live here is HIGH (SURVEY.md §7.2): most semantics are
  * expressible as compositions of Catalyst's built-in operators, which the
  * optimizer already reorders, prunes and pushes down (the 49 catalog
  * queries), or as scalar expressions, where the custom codegen tier lives
  * ([[graft.functions]], injected via [[graft.GraftExtensions]]). A
  * whole-operator physical plan that duplicates what
  * `broadcast() + groupBy + window` plans optimally — e.g. the as-of join
  * ([[graft.operators.AsOfJoin]]), one shuffle + one window — earns nothing.
  *
  * The resident operator clears that bar: [[TopKPerKeyNode]] /
  * [[TopKPerKeyStrategy]] / [[TopKPerKeyExec]] — per-key top-k, which
  * Catalyst can only express as a window row_number (full shuffle + per-group
  * sorts, even with 3.5+'s WindowGroupLimit pre-pruning). The custom operator
  * pre-prunes with per-partition k-heaps BEFORE the exchange and merges heaps
  * after, the per-key analog of `TakeOrderedAndProject` (catalog entry
  * `q_topk_per_key`, window-rank oracle; TopKPerKeySpec).
  *
  * [[WindowTopKRewrite]] is the optimizer-rule leg: it rewrites the standard
  * `row_number() ... WHERE rn <= k` idiom (DataFrame or SQL text) into the
  * operator — including stripping Spark's own WindowGroupLimit, which the
  * heap subsumes — so users get it without calling the API
  * (WindowTopKRewriteSpec).
  *
  * A future index-backed ANN probe pushed into the scan would follow the
  * same template.
  */
package object plans
