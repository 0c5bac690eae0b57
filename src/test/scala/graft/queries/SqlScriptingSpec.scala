package graft.queries

import graft.{GraftTestBase, Tables}

/** SQL scripting (Spark 4.1): BEGIN...END compound statements with
  * local variables, WHILE / REPEAT loops, IF/ELSE branching, and FOR
  * cursors — procedural orchestration entirely inside the SQL surface
  * (the script executes on the driver; each embedded query still plans
  * and runs distributed).
  */
class SqlScriptingSpec extends GraftTestBase {

  private def enableScripting(): Unit =
    spark.conf.set("spark.sql.scripting.enabled", "true")

  test("WHILE loop with local variables returns the final SELECT") {
    enableScripting()
    val r = spark.sql(
      """BEGIN
           DECLARE total BIGINT DEFAULT 0;
           DECLARE i INT DEFAULT 1;
           WHILE i <= 100 DO
             SET total = total + i;
             SET i = i + 1;
           END WHILE;
           SELECT total;
         END""").head
    assert(r.getLong(0) == 5050L)
  }

  test("scalar subqueries against real tables drive SET inside a loop") {
    enableScripting()
    Tables(spark, sf001).registerAll()
    // accumulate per-year order counts 1995..1997 procedurally...
    val script = spark.sql(
      """BEGIN
           DECLARE yr INT DEFAULT 1995;
           DECLARE total BIGINT DEFAULT 0;
           WHILE yr <= 1997 DO
             SET total = total +
               (SELECT count(*) FROM orders WHERE year(o_orderdate) = yr);
             SET yr = yr + 1;
           END WHILE;
           SELECT total;
         END""").head.getLong(0)
    // ...and it equals the one-shot declarative aggregate
    val direct = spark.sql(
      """SELECT count(*) FROM orders
         WHERE year(o_orderdate) BETWEEN 1995 AND 1997""").head.getLong(0)
    assert(script == direct && script > 0)
  }

  test("IF / ELSE branches on a data-dependent condition") {
    enableScripting()
    Tables(spark, sf001).registerAll()
    val r = spark.sql(
      """BEGIN
           DECLARE n BIGINT;
           SET n = (SELECT count(*) FROM region);
           IF n = 5 THEN
             SELECT 'five_regions' AS verdict;
           ELSE
             SELECT 'unexpected' AS verdict;
           END IF;
         END""").head
    assert(r.getString(0) == "five_regions")
  }

  test("FOR cursor iterates a query result") {
    enableScripting()
    Tables(spark, sf001).registerAll()
    val r = spark.sql(
      """BEGIN
           DECLARE names STRING DEFAULT '';
           FOR row AS SELECT r_name FROM region ORDER BY r_name DO
             SET names = names || '|' || row.r_name;
           END FOR;
           SELECT names;
         END""").head.getString(0)
    assert(r == "|AFRICA|AMERICA|ASIA|EUROPE|MIDDLE EAST")
  }

  test("REPEAT ... UNTIL runs the body at least once") {
    enableScripting()
    val r = spark.sql(
      """BEGIN
           DECLARE i INT DEFAULT 10;
           DECLARE steps INT DEFAULT 0;
           REPEAT
             SET steps = steps + 1;
             SET i = i + 1;
           UNTIL i > 10 END REPEAT;
           SELECT steps;
         END""").head
    assert(r.getInt(0) == 1)
  }
}
