package graft.connections

import graft.SparkSpec
import graft.config.TaskConfig

/** Unit pins for the connection registry: per-vendor JDBC URLs (reference
  * taskdriver.py:82,116,154,198), explicit-url override, environment
  * injection, and `$env.` resolution — the parts Derby round-trips cannot
  * exercise.
  */
class ConnectionsSpec extends SparkSpec {

  private def conns(json: String): Connections = {
    val fileJson = s"""{"connections": [$json], "tasks": []}"""
    val tmp = java.nio.file.Files.createTempFile("graft_conn_", ".json")
    java.nio.file.Files.writeString(tmp, fileJson)
    new Connections(TaskConfig.parseFile(tmp.toString), spark)
  }

  test("vendor URL builders match the reference drivers") {
    val c = conns(
      """{"name": "my", "driver": "MySQL", "host": "h1", "database": "db1"},
        |{"name": "pg", "driver": "PostgreSQL", "host": "h2", "port": "5544", "database": "db2"},
        |{"name": "ora", "driver": "Oracle", "host": "h3", "service": "svc"},
        |{"name": "ms", "driver": "MSSQL", "host": "h4", "database": "db4", "user": ""},
        |{"name": "dy", "driver": "Derby", "database": "memdb"}""".stripMargin)
    assert(c.jdbcUrl(c.get("my")) ==
      "jdbc:mysql://h1:3306/db1?characterEncoding=utf8&allowLoadLocalInfile=true")
    assert(c.jdbcUrl(c.get("pg")) == "jdbc:postgresql://h2:5544/db2")
    assert(c.jdbcUrl(c.get("ora")) == "jdbc:oracle:thin:@//h3:1521/svc")
    // empty user -> integratedSecurity, like the reference's trusted mode
    assert(c.jdbcUrl(c.get("ms")) ==
      "jdbc:sqlserver://h4:1433;databaseName=db4;integratedSecurity=true")
    assert(c.jdbcUrl(c.get("dy")) == "jdbc:derby:memdb;create=true")
  }

  test("explicit url key wins over the vendor builder") {
    val c = conns("""{"name": "x", "driver": "MySQL", "url": "jdbc:custom://y"}""")
    assert(c.jdbcUrl(c.get("x")) == "jdbc:custom://y")
  }

  test("unsupported driver raises") {
    val c = conns("""{"name": "x", "driver": "Sybase"}""")
    assertThrows[IllegalArgumentException](c.jdbcUrl(c.get("x")))
  }

  test("environment injection lands in system properties on get()") {
    val c = conns(
      """{"name": "e", "driver": "Derby", "database": "d",
        | "environment": [{"key": "GRAFT_TEST_ENV_K", "value": "v42"}]}""".stripMargin)
    c.get("e")
    assert(System.getProperty("GRAFT_TEST_ENV_K") == "v42")
  }
}
