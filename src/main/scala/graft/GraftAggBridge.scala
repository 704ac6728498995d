/*
 * Lives in org.apache.spark.sql.catalyst.expressions.aggregate to reach
 * the private[aggregate] CollectTopK — Spark's bounded top-k aggregate
 * (BoundedPriorityQueue buffer: O(num) state per group, partial-merged
 * map-side), which Spark uses internally but does not expose as a SQL or
 * Column function. Same bridge pattern as org.apache.spark.sql.GraftBridge.
 */
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftAggBridge {

  /** `collect_top_k(child, num)`: the `num` LARGEST child values by the
    * type's ordering (lexicographic for structs), evaluated to an array
    * sorted descending — a drop-in for
    * `slice(sort_array(collect_list(child), asc = false), 1, num)` whose
    * aggregation state is O(num), not O(group size). */
  def collectTopK(child: Expression, num: Int): Expression =
    CollectTopK(child, num, reverse = false).toAggregateExpression()
}
