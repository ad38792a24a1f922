package graft

import graft.operators.PiiRedact

/** PII redaction: pattern behavior on the tricky cases (multiple
  * matches, digit runs inside words, boundary lengths, order of
  * consumption between classes). */
class PiiRedactSpec extends GraftSuite {
  import spark.implicits._

  private def run(text: String): (Long, Long, Long, String) = {
    val r = PiiRedact.redact(Seq((1L, text)).toDF("doc_id", "text"))
      .head()
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("emails: multiple, with dots/plus tags; none inside plain words") {
    val (e, _, _, red) =
      run("write a.b+tag@mail.example.org or ops@x.io today")
    assert(e === 2L)
    assert(red === "write <EMAIL> or <EMAIL> today")
    assert(run("no at sign here")._4 === "no at sign here")
  }

  test("ipv4: word-bounded dotted quads only") {
    val (_, ips, _, red) = run("from 10.0.255.7 to 192.168.1.1.")
    assert(ips === 2L)
    assert(red === "from <IP> to <IP>.")
    // 4-digit octet: no boundary-satisfying quad exists
    assert(run("v1234.1.1.1 ok")._2 === 0L)
  }

  test("card-shaped ids: 13-16 digits, word-bounded; 12 and 17 do not match") {
    assert(run("card 4111111111111111 ok") ===
      ((0L, 0L, 1L, "card <ID> ok")))
    assert(run("n 123456789012 m")._3 === 0L) // 12 digits
    assert(run("n 12345678901234567 m")._3 === 0L) // 17 digits
    assert(run("id9999999999999999x ok")._3 === 0L) // embedded in word
  }

  test("email consumes its digits before the id pass; counts follow the sequence") {
    // the local part's 13-digit run is card-shaped, but the email rule
    // runs first and consumes it
    val (e, ips, ids, red) = run("mail 4111111111111@x.dk end")
    assert((e, ips, ids) === ((1L, 0L, 0L)))
    assert(red === "mail <EMAIL> end")
  }

  test("all three classes in one document") {
    val (e, ips, ids, red) =
      run("u@h.org at 8.8.8.8 pays 4000123456789012 twice: 4000123456789013")
    assert((e, ips, ids) === ((1L, 1L, 2L)))
    assert(red === "<EMAIL> at <IP> pays <ID> twice: <ID>")
  }
}
