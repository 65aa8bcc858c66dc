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
    // ANSI_QUOTES rides the URL so executor-side WRITER connections get
    // it too (sessionInitStatement is read-path only)
    assert(c.jdbcUrl(c.get("my")) ==
      "jdbc:mysql://h1:3306/db1?characterEncoding=utf8&allowLoadLocalInfile=true" +
        "&sessionVariables=sql_mode=ANSI_QUOTES")
    // reWriteBatchedInserts = the psycopg2 execute_batch analog
    assert(c.jdbcUrl(c.get("pg")) ==
      "jdbc:postgresql://h2:5544/db2?reWriteBatchedInserts=true")
    assert(c.jdbcUrl(c.get("ora")) == "jdbc:oracle:thin:@//h3:1521/svc")
    // empty user -> integratedSecurity, like the reference's trusted mode
    assert(c.jdbcUrl(c.get("ms")) ==
      "jdbc:sqlserver://h4:1433;databaseName=db4;integratedSecurity=true")
    assert(c.jdbcUrl(c.get("dy")) == "jdbc:derby:memdb;create=true")
  }

  test("MSSQL with a user carries no trusted flag; charset is ignored by design") {
    val c = conns(
      """{"name": "ms", "driver": "MSSQL", "host": "h", "database": "db",
        | "user": "sa", "pass": "p", "charset": "cp1252"}""".stripMargin)
    assert(c.jdbcUrl(c.get("ms")) == "jdbc:sqlserver://h:1433;databaseName=db")
  }

  test("PostgreSQL charset is ignored by design (pgjdbc is UTF-8-only)") {
    // a client_encoding URL param would be warn-and-ignored by pgjdbc —
    // carrying it would present the reference's charset intent as
    // honored when it silently isn't
    val c = conns(
      """{"name": "pg", "driver": "PostgreSQL", "host": "h", "database": "db",
        | "charset": "latin1"}""".stripMargin)
    assert(c.jdbcUrl(c.get("pg")) ==
      "jdbc:postgresql://h:5432/db?reWriteBatchedInserts=true")
  }

  test("Oracle gets the defaultNChar property (the output-type-handler analog)") {
    val c = conns(
      """{"name": "ora", "driver": "Oracle", "host": "h", "service": "s"},
        |{"name": "pg", "driver": "PostgreSQL", "host": "h", "database": "db"}""".stripMargin)
    assert(c.vendorProps(c.get("ora")) ==
      Map("oracle.jdbc.defaultNChar" -> "true"))
    assert(c.vendorProps(c.get("pg")).isEmpty)
    // and it reaches the read-path property set, alongside batching + init
    val p = c.jdbcProps(c.get("ora"))
    assert(p.getProperty("oracle.jdbc.defaultNChar") == "true")
    assert(p.getProperty("batchsize") == "10000")
  }

  test("MySQL read props still carry the ANSI_QUOTES init statement") {
    val c = conns(
      """{"name": "my", "driver": "MySQL", "host": "h", "database": "db",
        | "initializing": ["SET x=1"]}""".stripMargin)
    assert(c.jdbcProps(c.get("my")).getProperty("sessionInitStatement") ==
      "SET SQL_MODE=ANSI_QUOTES; SET x=1")
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
