package graft

/** Custom planner pieces (LogicalPlan / Rule[LogicalPlan] / SparkStrategy /
  * SparkPlan) — intentionally EMPTY, and that is a design decision, not a
  * gap (SURVEY.md §7.2):
  *
  * every operator this engine needs is expressible as either (a) compositions
  * of Catalyst's built-in operators, which the optimizer already reorders,
  * prunes and pushes down (all 40+ catalog queries), or (b) scalar
  * expressions, where the custom codegen tier lives instead
  * ([[graft.functions.ArrayDot]] / [[graft.functions.ArraySqDist]], injected
  * via [[graft.GraftExtensions]]). Adding a whole-operator physical plan
  * would duplicate what `broadcast() + groupBy + window` already plan
  * optimally — e.g. the as-of join ([[graft.operators.AsOfJoin]]) compiles to
  * one shuffle + one window, which is exactly the hand-written physical
  * algorithm.
  *
  * If a future round adds an operator Catalyst genuinely cannot express
  * (e.g. an index-backed ANN probe pushed into the scan), it goes here as
  * LogicalPlan + Strategy + SparkPlan registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
package object plans
