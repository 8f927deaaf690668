package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** From-scratch RFC 7932 brotli decoder, certified three ways:
  *
  *  1. COMMITTED REAL-ENCODER VECTORS: the `Vectors` streams below are
  *     actual libbrotli encoder output (qualities 5-11) captured at
  *     build time — they exercise complex prefix codes, 16/17 repeat
  *     coding, context modes + context maps with inverse MTF, block
  *     switching, backward copies, UTF-8 payloads, incompressible
  *     passthrough, AND static-dictionary references with word
  *     transforms ("dicty"/"html" hit Appendix A+B). Decoding them
  *     bit-exactly is the cross-implementation differential test that
  *     does not need libbrotli at test time.
  *  2. ROUND-TRIP through the repo's own valid-stream fixture encoders
  *     (stored + compressed-literal framings, both libbrotli-verified
  *     at build time).
  *  3. LOUDNESS: malformed input throws with an offset, never decodes
  *     garbage.
  */
class BrotliSpec extends SparkSpec {

  // (name, base64 raw, base64 brotli) — REAL libbrotli encoder output
  val Vectors: Seq[(String, String, String)] = Seq(
    ("empty", "",
     "Bg=="),
    ("one", "Wg==",
     "CwCAWgM="),
    ("repeat", "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFi" +
      "Y2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdo" +
      "YWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVm" +
      "Z2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNkZWZnaGFiY2RlZmdoYWJjZGVmZ2hhYmNk" +
      "ZWZnaA==",
     "G58PAMQBx4C4Pn4Lh9QBACinOw=="),
    ("tokens", "dG9rMzkwMCB0b2swY2NlIHRvazhjZDAgdG9rN2Q2MiB0b2s3MjQ4IHRvazQ3NzEgdG9rMzQ3" +
      "YSB0b2syYzgzIHRva2Q4MDYgdG9rMTA0NSB0b2swZjQxIHRvazJmZjggdG9rNmZmMSB0b2s3" +
      "NzFmIHRvazBkOTYgdG9rNjVjZSB0b2tkNmNiIHRvazcwZGQgdG9rZTVmZSB0b2s4ZTZmIHRv" +
      "azAzNTMgdG9rNTFiZSB0b2tkODYwIHRva2FlMzUgdG9rOGU0NSB0b2s0ZjliIHRvazZlM2Qg" +
      "dG9rYWM1NiB0b2szNDU0IHRvazJmN2MgdG9rYzI4NSB0b2szMTg0IHRva2I3Y2MgdG9rYjAx" +
      "YSB0b2s4NzZmIHRvazE2M2YgdG9rZWIzOSB0b2szZmU5IHRva2MxY2YgdG9rMjg1OCB0b2s5" +
      "NjFiIHRva2I5MjggdG9rNjI3MyB0b2syMzljIHRvazE3NzYgdG9rNzRhZiB0b2s5NDJhIHRv" +
      "azI4ZGEgdG9rNzczMCB0b2szM2I2IHRva2MyOWYgdG9rOGU1MiB0b2tlODI1IHRva2JhY2Ig" +
      "dG9rNTM0NyB0b2tiZDg4IHRva2I1ZTYgdG9rNmI0NCB0b2s4OGIxIHRvazI0OGUgdG9rNTc5" +
      "ZiB0b2s3ZDU3IHRvazUzYTkgdG9rZWNhZCB0b2tjMjQ3IHRvazhhMzYgdG9rNzA3MSB0b2th" +
      "NjA4IHRvazFjYTMgdG9rNzU0NSB0b2sxMDZmIHRva2ExODMgdG9rY2Q2NSB0b2s4OTE1IHRv" +
      "azIxZTMgdG9rNmMwNSB0b2thMTFkIHRvazZjZGQgdG9rZmY5YiB0b2tjYTkwIHRva2VhZWUg" +
      "dG9rNDkyNiB0b2s4NzllIHRvazQ3N2QgdG9rN2U0NSB0b2s4Njg2IHRva2RiNWIgdG9rY2M3" +
      "ZSB0b2tiOTU3IHRvazcwNGEgdG9rNDZkMyB0b2tmY2FlIHRvazJlOGIgdG9rMTgxZiB0b2sz" +
      "ODIzIHRvazRlNDEgdG9rNTFlOSB0b2tkODI1IHRvazIwODYgdG9rYzUwMCB0b2tjMzYzIHRv" +
      "a2VmYTQgdG9rODBiOSB0b2swNWUwIHRvazNhYTYgdG9rODg5ZCB0b2thZTJiIHRvazM5MWQg" +
      "dG9rOTY0NSB0b2tkZTk5IHRvazUwZmEgdG9rZTg0ZSB0b2swMWE5IHRvazg2ZGEgdG9rNWI3" +
      "OCB0b2szNjdiIHRvazk4Y2QgdG9rNjVkNyB0b2s0ZTQwIHRva2JmNzEgdG9rNTJiNiB0b2sw" +
      "MDRhIHRva2E1ZjcgdG9rZmEyYSB0b2swOWY4IHRvazM5NDYgdG9rYjlkOCB0b2s5ZDcyIHRv" +
      "azdhOTkgdG9rMWRhOCB0b2s3YjUzIHRvazI4NTIgdG9rMmJkYSB0b2tmOGQzIHRvazIzNmYg" +
      "dG9rNDA2MyB0b2s0MWJjIHRva2YzNTggdG9rNTQ4YiB0b2s4N2I1IHRva2Q4YTUgdG9rNmM3" +
      "MCB0b2s2NmZkIHRvazlmOTkgdG9rY2M0OCB0b2tiZjMwIHRva2UwNGUgdG9rZTcyOSB0b2sz" +
      "ZGY0IHRvazdlZWQgdG9rNzMwYiB0b2syMGM4IHRva2FkMTkgdG9rMGFjNSB0b2s3NWQxIHRv" +
      "azcwYzAgdG9rMDNhZSB0b2syNDU5IHRvazFlMjQgdG9rNzUzNyB0b2syMjgyIHRvazEwMTUg" +
      "dG9rYTkyZCB0b2syNDQ3IHRvazc5ZGIgdG9rOGU5NCB0b2tmODg4IHRvazZkYjAgdG9rNDNi" +
      "ZSB0b2tmMjAxIHRvazdjNmEgdG9rZjIyOSB0b2tkMDZhIHRvazYxN2QgdG9rMzA0YiB0b2sz" +
      "MWEwIHRva2RjYjIgdG9rYjU2NiB0b2tkOGRmIHRva2QyN2IgdG9rZWYxZCB0b2sxYmJjIHRv" +
      "azMyNjMgdG9rMWYwOCB0b2tjZTI0IHRva2FkYjkgdG9rMzdmMiB0b2s3ZjRmIHRvazYyMTgg" +
      "dG9rNjE2MyB0b2tlNWIwIHRvazQ3YzUgdG9rZDgwMCB0b2s1ZGYyIHRvazhlOWQgdG9rZWNk" +
      "ZCB0b2s3ZmU2IHRvazI2OTggdG9rZTJlMiB0b2szMjIxIHRvazE5ZTYgdG9rMDc4ZSB0b2sy" +
      "ZmMwIHRvazc5MDYgdG9rNTUyNiB0b2tkMDE1IHRva2Y4YTUgdG9rZjY3NCB0b2s2ZDcwIHRv" +
      "a2NkNTUgdG9rMWUwNSB0b2s1NDRiIHRva2MyMDggdG9rMDExYSB0b2tjN2U1IHRvazg3Yzgg" +
      "dG9rZThmNiB0b2s5MjBjIHRva2Q4OTQgdG9rZjkyYyB0b2s0ZjQxIHRvazYxM2EgdG9rOTdl" +
      "YSB0b2s2Zjc2IHRvazFkZjEgdG9rMWYzNSB0b2thMDkwIHRvazFkNDQgdG9rMTlhYyB0b2tm" +
      "NDFkIHRvazUwOWIgdG9rMWQxZiB0b2syOTA0IHRvazVmMjQgdG9rMjMxNSB0b2syMmNiIHRv" +
      "azc4NmMgdG9rY2ViYiB0b2szZDYxIHRvazdlMGYgdG9rMTQ1OSB0b2syOWY5IHRva2Q2YTQg" +
      "dG9rYTFmYiB0b2s4NTgzIHRvazY4OTQgdG9rYTBkYyB0b2s3YTM1IHRvazg3ZmUgdG9rY2Fh" +
      "NCB0b2s0MzAyIHRvazk5OTkgdG9rZWExOSB0b2thMWUxIHRvazI1MjQgdG9rMDRjNCB0b2tl" +
      "YWE0IHRvazMzMzAgdG9rMjU4MiB0b2s2ZDIyIHRvazg3YzggdG9rNDNkMSB0b2tiMmIxIHRv" +
      "azIzMzggdG9rN2QxMiB0b2tiZDMyIHRvazkxZTkgdG9rNTBjNCB0b2tlMDU5IHRvazlhZTMg" +
      "dG9rMDQwMSB0b2s5OTQ4IHRvazM1MDkgdG9rNDRjMSB0b2s4NzY4IHRvazNiMTkgdG9rMzZj" +
      "ZCB0b2s0Zjk2IHRvazhiNzEgdG9rOTA0MiB0b2s2YmQ3IHRva2FmOGUgdG9rNjgzZCB0b2s4" +
      "NzI4IHRva2ZhMjAgdG9rODA5MiB0b2sxYTAyIHRvazJmNDEgdG9rZDhkZSB0b2s4ZGE5IHRv" +
      "azE2OTIgdG9rMDFkMCB0b2thYWM3IHRvazQyZmEgdG9rODYxZiB0b2s1MmJhIHRva2UyMzgg" +
      "dG9rZGFmOSB0b2swNGYzIHRvazM5NDcgdG9rMjY4NiB0b2s0YzUwIHRvazEyNzIgdG9rYmQw" +
      "OSB0b2s0YmQyIHRva2RjMGQgdG9rNDE0MCB0b2sxNTZhIHRvazlkZDQgdG9rYmFiMyB0b2sx" +
      "NDZkIHRva2I3MzIgdG9rNmI4ZiB0b2s3ZmMyIHRvazM0YTEgdG9rYjUxNSB0b2tkMDEwIHRv" +
      "azRmMjEgdG9rNzkzNSB0b2s1MzMzIHRvazVhYTYgdG9rZDMxOCB0b2swY2IwIHRvazViZDUg" +
      "dG9rYWExNCB0b2tkMmNjIHRvazdmMGYgdG9rODg5YSB0b2s1MTgyIHRvazM3NTggdG9rYzNk" +
      "YyB0b2sxM2QzIHRva2YwZmUgdG9rNzFlMiB0b2s2NjJlIHRva2ViYWMgdG9rYjMwNiB0b2s5" +
      "YzQxIHRvazc0ODcgdG9rNzIyMyB0b2swYzFkIHRvazYyZTEgdG9rY2MwMyB0b2thODExIHRv" +
      "azhlYTUgdG9rMjM4YiB0b2s4ZWU5IHRva2IzYzkgdG9rY2NhMiB0b2thOThjIHRvazBlMjEg" +
      "dG9rM2IwZSB0b2s4NWJkIHRvazViNmQgdG9rODdlYiB0b2sxMzk2IHRvazM3ODAgdG9rZGU3" +
      "ZiB0b2tiMGZkIHRva2EwOWEgdG9rZGY2ZiB0b2szYjM1IHRva2M1MzggdG9rNjE1MiB0b2s4" +
      "MjZhIHRvazE2YjkgdG9rZGY0MiB0b2swMGRkIHRvazY0ZTEgdG9rYmE3YiB0b2tkY2QzIHRv" +
      "azIzZDMgdG9rYTkwZiB0b2thMGI5IHRvazNmY2UgdG9rOTljMyB0b2s5ZTVhIHRva2QxMTgg" +
      "dG9rYTcwMSB0b2tjZTA3IHRvazk3NjAgdG9rNDEyYiB0b2s2MjM4IHRva2Q3NDQgdG9rYzIx" +
      "ZiB0b2s1OTFhIHRvazlhMTYgdG9rY2ZlOSB0b2swMDM1IHRvazliOTUgdG9rOTJlNiB0b2s2" +
      "YjlkIHRva2RjMWEgdG9rYTRmZCB0b2tlZTEyIHRva2UyMzEgdG9rZTI2MiB0b2s2ZDZhIHRv" +
      "a2YyNDUgdG9rNTZlMQ==",
     "G34MAGTxUNIB5lzDNEcGk0FFs5QaR8wbJAFE/OhQZvJtrUl1Xp0JCIPRuaKi/u8xcVWklOL9" +
      "8/99OQE+fzt0r9Ezd/kYtUeS2MUddxavnTp4nwDbEUSFk7XS3d5hd7s7njC5B1Obx1i/R5jJ" +
      "6t2FtT5ZbUXxtRl2R2vZJrG2lcuzhi1brbbuLCp3+uBtU+yRMX4bz9sH6BvhtkXj730f5+Bb" +
      "G3tIoT6ahiMvyedJfmeJ82zRvetSLSmE4Yz51p19kvmtHU1prMbADbozr7C6lMXbnLCZp4vp" +
      "fOJTIl4MpgRmqJ+pj+5VuXy5b9fYPEei+K4FsbYMbIhdDVesn9qJEYUcSI/FYkuUcH8b1nAv" +
      "xJk7Y9wXK7vSd7f2rpckWcNzbrrvaY+xYbEm8/SM2b6Wl77pIJgqNnfwutZIG3vA4KAc1JHl" +
      "Koqx7cEaAlu05obNtid7hfGE1wK6sduqEpHcG0uv0nfSfHA2914KV30LATAmhHHi0Ocxzc8a" +
      "Gf1uOn73V9u8ixVK3GnAwNJbyxXXgMxFOaX7cuaS4zledTdxauAv56DgIPQGF9hCzAEEsFHw" +
      "cZ3jnEAF84Q/32fU92HtgB02dbZHt/AuF1joY53kOezju5yYDF2C3psajMmstqXrjMOhoZkL" +
      "iPrK0pkqe9soQOCwlWQLktyI5/g0N/dykXvavI6wNnkEPd6GWZEPDMxhyGkZpMtYZzj97pCn" +
      "xvEZgzFDHGCPS+DDGibswcvRbp+o4abs1/STs2KEd27kcuvdyzFjguvo7CWWy705i5/GSJZn" +
      "ubRrZSKfwVwDuOZAhz2etQHV3O7BuI8Tx5lLDTfs0d/A1Q5UsKLJVwA12vZdQzgH3DgbJgFG" +
      "ayJWM2mupSZpyGc85Os3dtoMTo0Cr6ZQoE3gaGowi+MlsUBBw8DRFClhLXpjEWthU20jrPaw" +
      "L/aMcYWFWnPjppTXGNOaFB73SrW2zbdRMMurBpbXTLr2KgwxIjPH2MqRFG5tKL2rIP3duxfm" +
      "HIQ0J/6zIcIa4dxaj2rMZP4tPshhhm3fNHUp2CjwkazaAEiukJn7skJTpH/7GG717g6bBiL3" +
      "diCe9iVB7lpPG6njIBZvAMJrslfk2whIsDBq4oYTs5cYLQZtLYBvoVS19hZpN2Gxf+6vcyxh" +
      "wVQM30GONfd1b1PtirRya5FjdvN9vpnLNPhaqPGgakdy5q1CvdyfYmt5jrn2YujXIywVq1Iu" +
      "ZgBzvi5n8eSOynxmaw1jWCuA1oihb64qlFb0VsKPu4nImlXIGdhrAM0cXci1uKDhqB2a0Rz7" +
      "covHWkF2TOIS2ltUqxf0G6KIw3bDb1bgHLGasohrTy0HfzzuGvOpbFsZNoHFIvwg9ujL7XrY" +
      "JnxzvJhzYQ+tHutXUMMowIC5mgg/bGnlBIY1lKBYgqbRzHG34c2LiW+80vy36Vp7flOJedfb" +
      "A763s5m9Jrl6l8IYUp5jVy/4KH8zI/g2+WycLde41cTpLdEs7N1vXgB8S778/kxvzrNWML2X" +
      "EmzY1YT7EuP3+b/Em01tPN9Ef9UWAQ=="),
    ("random", "K5GrL3iec2VLDBd98yXp1GPE/cx8SwI22XBa7Rl/PulE7aLi2uRR8+aEfo34eozhJ5J4i6uj" +
      "KUZNdsRObSDU0Knu1B9p18cKwvQDtJjH1nD5cIvf+A7HrM9U70ENyQ0q20XsXRmFwqds6Kes" +
      "wo7XgSnwCRqzciMUD35mCk56QPI6b+6DvFU6U583DZ/Ay2UmfDSaPRWx270jrgbX+jbduetO" +
      "3lqK9+7fiaV9LI7mfO3CrA79pl35bLWEro+NBWEre9D6e/P75QgvlnHPfJy88rDZqbToipyA" +
      "dj1ioT1eYm73jZAzY5d0uFuaB0CMFxuVQPs0BpHw9eGuXhqB9DohzfslG01Mmyt/PNVzwubi" +
      "mNucHjJqbIcpUHpYJlAB0ebwlRB2k5DoJHeHZdk6c0yISCQeVJ2T4D/vm86L/OApFN2lgA0u" +
      "dQqJFFnw4o5c3/su8LLRqqQ1UqjS/ZPNEugtoYGlO84A7NMbYLn/4hpoiEOT4Pg+DnpRnwfQ" +
      "L3M67DxO/5WL1PfxfOlKxGFFI43UrogBkJj6TOT3sKrB6aRgesR30hai8sPFTf0SQKkz4TPp" +
      "B0nRTybwh63LKajCovkSI3iTdC7eMjPjVZkOF6Yclre/3Ep90lxXWSjDe/5JduyC64IE7pNQ" +
      "JeKwmdmA6ZplxPc2ecO3l5cLyowEGf6SdbRwYYBGMRSe4RG6Qy6Xp9RZZkO7i1SD9petOu8m" +
      "SHPLuy7KB4c/6LyGw743d/EMp3Eg7ZrRO0cXE5v8OzF4RcbovdZP1DL60I8QvW/j43i5Mry3" +
      "H8uNYT7oLmwKGap8QGkjam53qEsBjUpCgFk4DUMHt3mlCFmHGkDXOiDz5bk353EWmuoPH/XN" +
      "2jf74yUppEshQIymw5bo3DI6btzndNOt6MzUMKDaoIK/TvIiLisv3TG+Qh6oPtK12BqTn7Q1" +
      "bE/2cjezvDqOc9sNiA5ci56tswNcSc0jSA8ubsDW6K5QvZ+mKxpPUBkpi+LZ+OLUi246sNw4" +
      "kfmdF3DKHANommxGgpSnPQP+3FlCwnW1JMsV3wnrJ6Dbz9WUOs8KplfruS3fNnzfzSjKnq1x" +
      "qlYnOmOys0t4NEqDZVhOJlr87eWloU3hIvDim4wctCWe7OcTHbySJy7E7BXmYKTzTR/mNK8r" +
      "WBR+4OBRur6QxtGtGqshqDDFkYFMqilIs57IQiuewKhBL9i5CbmeXG2u+GJzRk8nlzMTrEPA" +
      "TlNcVOAW0rp545Hld3qe8GO84eyQw9ZSZkaAGva+ND+RKlKL5kvfLnHmsg3UG8q/eMUpv3IO" +
      "ozKrSkYTkvFH8OUCKAmDbkzYOJN5mj4YetbqIDj/CHtJldsAtHvVXyu4IgrH8BbGv4EItiKw" +
      "ezWqRBa0rVnt9V1FIOoSlmcWZhWhnsvygRJhkrYYqYs/vN/M4cWtX/7+vIgq2SjcXJakNCin" +
      "l5zk2lXjs+QVtN6MHSbPulEPSeARQCJ4u7nEEE7mvb7jJ0a7y6COfzoNX//GPIaF5G2S+2Y+" +
      "RSXnWOMso7EhlJlQWblyPmZHefwNuLzvQiwhnsv10tElQKIl5u6wQV1C3Rw/TptUUqVzsZEo" +
      "gGSMQJsvVk5XrBUOKReHa9UP/pSa933PmOglHlDh1PftaK5JoKOwzEK9NqN77j6I5n5IMRmU" +
      "xNZ/UaegYVH/7/+d/gsuyep7brQYGZD98JIEN9xEh7vOuxfNGmO5kyXF5o88QTHJv627SWXN" +
      "FBcTRqry6UxHp6NTyZms+pnzCLypONWdDfKHdBr1V8JLfBA4YQnhoNZN02jS8R9Gaqb0wKBY" +
      "66+1h/difo6Yc5iTavqi9bKMkz7CyrBKlBWTKLHig/VtZ4qLRjd6fBlzdxoz06nxM0YCUNDz" +
      "9GaTpJIeLXYTWdVaEsv9X5QTBJg2q5Ho/ETvi2I5qVPqg18HrJdiWc/apyzNMF5H9KV/A4XE" +
      "eOSIqJoFhbh4HzzunVHPnzyXvHFwRPRO6L/U8W9+KeS5JzkfZ0xUp+I7afou5BzoQ9TpHeyd" +
      "C8qCAW8lF9iwIB4j8RCS0VxF17/D5cHAKUSyPFvJQXIBC5jt2cJ1fuuxT41gORDWCHtpIjMR" +
      "5Bh9Fs3gd28cR5R3o6R5mklx05mMH1na/Riww6PV0UyZwF7ye3OZSe0d09VExnyCaKko5r0v" +
      "YRqJwRQlYG/1aqqbB2xhPPV8aMt6pJDC7redhbj+7jLwo2i9oNMXcUoIhdWXTmSodcJ9/6yD" +
      "+vvrVrRWR/peHhEmGAPTRnYiTQRv6b8e9/kIA9IGCIySCNxbNjFMe2KBtYjLKL/P63xzmSkQ" +
      "L8/CwfMcBFcq/96pMBV1bPOKFyaPEFuhCGpJyyeZU3vHqcRHKLEbMt92Jq7Lpw+L5vt0tsDd" +
      "X8Irl34lKolOwk7Horg2LgKd47iKNEMsX9zl0DQNLbUvpsUGldPGK3xWwlZHiZqJ/EogVd6N" +
      "15n3J7iAfv1k6jZFmwPKqsKo4avcRZmkZvWgWsujlft8psCPybo6ZlwN7GvglSPR/0ebe4FO" +
      "2MEl5fXN1hK4Kzd/tVUWzKncNgUyhHFx5L/I7U2wDPc1l9QrO0iyn6/pafey8zHg56MimRY6" +
      "C683VHxZUana7HbPXl/dyg5l5tvHAm1pjiA0X7umZOo6hvqgxsg6srTqWJgrRKA8epw7Xb9I" +
      "xtZGxNhf+VhV+pNHX6HmG7cE+EVjxP3R+9Tj+lUqD3CVEIxzk1bq/Tk6ibsV4W/ZNH4=",
     "i/+DK5GrL3iec2VLDBd98yXp1GPE/cx8SwI22XBa7Rl/PulE7aLi2uRR8+aEfo34eozhJ5J4" +
      "i6ujKUZNdsRObSDU0Knu1B9p18cKwvQDtJjH1nD5cIvf+A7HrM9U70ENyQ0q20XsXRmFwqds" +
      "6Keswo7XgSnwCRqzciMUD35mCk56QPI6b+6DvFU6U583DZ/Ay2UmfDSaPRWx270jrgbX+jbd" +
      "uetO3lqK9+7fiaV9LI7mfO3CrA79pl35bLWEro+NBWEre9D6e/P75QgvlnHPfJy88rDZqbTo" +
      "ipyAdj1ioT1eYm73jZAzY5d0uFuaB0CMFxuVQPs0BpHw9eGuXhqB9DohzfslG01Mmyt/PNVz" +
      "wubimNucHjJqbIcpUHpYJlAB0ebwlRB2k5DoJHeHZdk6c0yISCQeVJ2T4D/vm86L/OApFN2l" +
      "gA0udQqJFFnw4o5c3/su8LLRqqQ1UqjS/ZPNEugtoYGlO84A7NMbYLn/4hpoiEOT4Pg+DnpR" +
      "nwfQL3M67DxO/5WL1PfxfOlKxGFFI43UrogBkJj6TOT3sKrB6aRgesR30hai8sPFTf0SQKkz" +
      "4TPpB0nRTybwh63LKajCovkSI3iTdC7eMjPjVZkOF6Yclre/3Ep90lxXWSjDe/5JduyC64IE" +
      "7pNQJeKwmdmA6ZplxPc2ecO3l5cLyowEGf6SdbRwYYBGMRSe4RG6Qy6Xp9RZZkO7i1SD9pet" +
      "Ou8mSHPLuy7KB4c/6LyGw743d/EMp3Eg7ZrRO0cXE5v8OzF4RcbovdZP1DL60I8QvW/j43i5" +
      "Mry3H8uNYT7oLmwKGap8QGkjam53qEsBjUpCgFk4DUMHt3mlCFmHGkDXOiDz5bk353EWmuoP" +
      "H/XN2jf74yUppEshQIymw5bo3DI6btzndNOt6MzUMKDaoIK/TvIiLisv3TG+Qh6oPtK12BqT" +
      "n7Q1bE/2cjezvDqOc9sNiA5ci56tswNcSc0jSA8ubsDW6K5QvZ+mKxpPUBkpi+LZ+OLUi246" +
      "sNw4kfmdF3DKHANommxGgpSnPQP+3FlCwnW1JMsV3wnrJ6Dbz9WUOs8KplfruS3fNnzfzSjK" +
      "nq1xqlYnOmOys0t4NEqDZVhOJlr87eWloU3hIvDim4wctCWe7OcTHbySJy7E7BXmYKTzTR/m" +
      "NK8rWBR+4OBRur6QxtGtGqshqDDFkYFMqilIs57IQiuewKhBL9i5CbmeXG2u+GJzRk8nlzMT" +
      "rEPATlNcVOAW0rp545Hld3qe8GO84eyQw9ZSZkaAGva+ND+RKlKL5kvfLnHmsg3UG8q/eMUp" +
      "v3IOozKrSkYTkvFH8OUCKAmDbkzYOJN5mj4YetbqIDj/CHtJldsAtHvVXyu4IgrH8BbGv4EI" +
      "tiKwezWqRBa0rVnt9V1FIOoSlmcWZhWhnsvygRJhkrYYqYs/vN/M4cWtX/7+vIgq2SjcXJak" +
      "NCinl5zk2lXjs+QVtN6MHSbPulEPSeARQCJ4u7nEEE7mvb7jJ0a7y6COfzoNX//GPIaF5G2S" +
      "+2Y+RSXnWOMso7EhlJlQWblyPmZHefwNuLzvQiwhnsv10tElQKIl5u6wQV1C3Rw/TptUUqVz" +
      "sZEogGSMQJsvVk5XrBUOKReHa9UP/pSa933PmOglHlDh1PftaK5JoKOwzEK9NqN77j6I5n5I" +
      "MRmUxNZ/UaegYVH/7/+d/gsuyep7brQYGZD98JIEN9xEh7vOuxfNGmO5kyXF5o88QTHJv627" +
      "SWXNFBcTRqry6UxHp6NTyZms+pnzCLypONWdDfKHdBr1V8JLfBA4YQnhoNZN02jS8R9Gaqb0" +
      "wKBY66+1h/difo6Yc5iTavqi9bKMkz7CyrBKlBWTKLHig/VtZ4qLRjd6fBlzdxoz06nxM0YC" +
      "UNDz9GaTpJIeLXYTWdVaEsv9X5QTBJg2q5Ho/ETvi2I5qVPqg18HrJdiWc/apyzNMF5H9KV/" +
      "A4XEeOSIqJoFhbh4HzzunVHPnzyXvHFwRPRO6L/U8W9+KeS5JzkfZ0xUp+I7afou5BzoQ9Tp" +
      "HeydC8qCAW8lF9iwIB4j8RCS0VxF17/D5cHAKUSyPFvJQXIBC5jt2cJ1fuuxT41gORDWCHtp" +
      "IjMR5Bh9Fs3gd28cR5R3o6R5mklx05mMH1na/Riww6PV0UyZwF7ye3OZSe0d09VExnyCaKko" +
      "5r0vYRqJwRQlYG/1aqqbB2xhPPV8aMt6pJDC7redhbj+7jLwo2i9oNMXcUoIhdWXTmSodcJ9" +
      "/6yD+vvrVrRWR/peHhEmGAPTRnYiTQRv6b8e9/kIA9IGCIySCNxbNjFMe2KBtYjLKL/P63xz" +
      "mSkQL8/CwfMcBFcq/96pMBV1bPOKFyaPEFuhCGpJyyeZU3vHqcRHKLEbMt92Jq7Lpw+L5vt0" +
      "tsDdX8Irl34lKolOwk7Horg2LgKd47iKNEMsX9zl0DQNLbUvpsUGldPGK3xWwlZHiZqJ/Eog" +
      "Vd6N15n3J7iAfv1k6jZFmwPKqsKo4avcRZmkZvWgWsujlft8psCPybo6ZlwN7GvglSPR/0eb" +
      "e4FO2MEl5fXN1hK4Kzd/tVUWzKncNgUyhHFx5L/I7U2wDPc1l9QrO0iyn6/pafey8zHg56Mi" +
      "mRY6C683VHxZUana7HbPXl/dyg5l5tvHAm1pjiA0X7umZOo6hvqgxsg6srTqWJgrRKA8epw7" +
      "Xb9IxtZGxNhf+VhV+pNHX6HmG7cE+EVjxP3R+9Tj+lUqD3CVEIxzk1bq/Tk6ibsV4W/ZNH4D"),
    ("html", "PGh0bWw+PGhlYWQ+PHRpdGxlPng8L3RpdGxlPjwvaGVhZD48Ym9keT48cD5oZWxsbyB3b3Js" +
      "ZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+" +
      "PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNh" +
      "c3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVy" +
      "Z2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVz" +
      "dCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQg" +
      "dGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxw" +
      "PmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0" +
      "IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdl" +
      "bmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qg" +
      "b2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRo" +
      "aXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5o" +
      "ZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBz" +
      "eXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5j" +
      "eSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9m" +
      "IHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlz" +
      "IGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVs" +
      "bG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lz" +
      "dGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kg" +
      "YnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0" +
      "aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBp" +
      "cyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxv" +
      "IHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3Rl" +
      "bTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJy" +
      "b2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhl" +
      "IGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMg" +
      "YSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3" +
      "b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08" +
      "L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9h" +
      "ZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBl" +
      "bWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEg" +
      "dGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29y" +
      "bGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9w" +
      "PjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRj" +
      "YXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1l" +
      "cmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRl" +
      "c3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxk" +
      "IHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48" +
      "cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2Fz" +
      "dCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJn" +
      "ZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0" +
      "IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0" +
      "aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+" +
      "aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qg" +
      "c3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2Vu" +
      "Y3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBv" +
      "ZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhp" +
      "cyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhl" +
      "bGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5" +
      "c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5" +
      "IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2Yg" +
      "dGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMg" +
      "aXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxs" +
      "byB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0" +
      "ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBi" +
      "cm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRo" +
      "ZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlz" +
      "IGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8g" +
      "d29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVt" +
      "PC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJv" +
      "YWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUg" +
      "ZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBh" +
      "IHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdv" +
      "cmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwv" +
      "cD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2Fk" +
      "Y2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVt" +
      "ZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0" +
      "ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3Js" +
      "ZCB0aGlzIGlzIGEgdGVzdCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+" +
      "PHA+aGVsbG8gd29ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNh" +
      "c3Qgc3lzdGVtPC9wPjxwPmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVy" +
      "Z2VuY3kgYnJvYWRjYXN0IHN5c3RlbTwvcD48cD5oZWxsbyB3b3JsZCB0aGlzIGlzIGEgdGVz" +
      "dCBvZiB0aGUgZW1lcmdlbmN5IGJyb2FkY2FzdCBzeXN0ZW08L3A+PHA+aGVsbG8gd29ybGQg" +
      "dGhpcyBpcyBhIHRlc3Qgb2YgdGhlIGVtZXJnZW5jeSBicm9hZGNhc3Qgc3lzdGVtPC9wPjxw" +
      "PmhlbGxvIHdvcmxkIHRoaXMgaXMgYSB0ZXN0IG9mIHRoZSBlbWVyZ2VuY3kgYnJvYWRjYXN0" +
      "IHN5c3RlbTwvcD48L2JvZHk+PC9odG1sPg==",
     "G+oPAEUnR3qwQL6blfatQzo5cPi/04USSMsisaBuOI33vyhSglbQKB4InJ8VmCIlWnkPRPAm" +
      "Y09fsHN5pasVmnzLAQDL+O69AA=="),
    ("log", "aWQ9MDAwMDAwIGxldmVsPTAgbXNnPXFxcTByYXcKaWQ9MDAwMDAxIGxldmVsPTEgbXNnPXFx" +
      "cTFyYXcKaWQ9MDAwMDAyIGxldmVsPTIgbXNnPXFxcTRyYXcKaWQ9MDAwMDAzIGxldmVsPTMg" +
      "bXNnPXFxcTlyYXcKaWQ9MDAwMDA0IGxldmVsPTQgbXNnPXFxcTE2cmF3CmlkPTAwMDAwNSBs" +
      "ZXZlbD01IG1zZz1xcXEyNXJhdwppZD0wMDAwMDYgbGV2ZWw9NiBtc2c9cXFxMzZyYXcKaWQ9" +
      "MDAwMDA3IGxldmVsPTAgbXNnPXFxcTQ5cmF3CmlkPTAwMDAwOCBsZXZlbD0xIG1zZz1xcXE2" +
      "NHJhdwppZD0wMDAwMDkgbGV2ZWw9MiBtc2c9cXFxODFyYXcKaWQ9MDAwMDEwIGxldmVsPTMg" +
      "bXNnPXFxcTEwMHJhdwppZD0wMDAwMTEgbGV2ZWw9NCBtc2c9cXFxMTIxcmF3CmlkPTAwMDAx" +
      "MiBsZXZlbD01IG1zZz1xcXExNDRyYXcKaWQ9MDAwMDEzIGxldmVsPTYgbXNnPXFxcTE2OXJh" +
      "dwppZD0wMDAwMTQgbGV2ZWw9MCBtc2c9cXFxMTk2cmF3CmlkPTAwMDAxNSBsZXZlbD0xIG1z" +
      "Zz1xcXEyMjVyYXcKaWQ9MDAwMDE2IGxldmVsPTIgbXNnPXFxcTI1NnJhdwppZD0wMDAwMTcg" +
      "bGV2ZWw9MyBtc2c9cXFxMjg5cmF3CmlkPTAwMDAxOCBsZXZlbD00IG1zZz1xcXEzMjRyYXcK" +
      "aWQ9MDAwMDE5IGxldmVsPTUgbXNnPXFxcTM2MXJhdwppZD0wMDAwMjAgbGV2ZWw9NiBtc2c9" +
      "cXFxNDAwcmF3CmlkPTAwMDAyMSBsZXZlbD0wIG1zZz1xcXE0NDFyYXcKaWQ9MDAwMDIyIGxl" +
      "dmVsPTEgbXNnPXFxcTQ4NHJhdwppZD0wMDAwMjMgbGV2ZWw9MiBtc2c9cXFxNTI5cmF3Cmlk" +
      "PTAwMDAyNCBsZXZlbD0zIG1zZz1xcXE1NzZyYXcKaWQ9MDAwMDI1IGxldmVsPTQgbXNnPXFx" +
      "cTYyNXJhdwppZD0wMDAwMjYgbGV2ZWw9NSBtc2c9cXFxNjc2cmF3CmlkPTAwMDAyNyBsZXZl" +
      "bD02IG1zZz1xcXE3MjlyYXcKaWQ9MDAwMDI4IGxldmVsPTAgbXNnPXFxcTc4NHJhdwppZD0w" +
      "MDAwMjkgbGV2ZWw9MSBtc2c9cXFxODQxcmF3CmlkPTAwMDAzMCBsZXZlbD0yIG1zZz1xcXE5" +
      "MDByYXcKaWQ9MDAwMDMxIGxldmVsPTMgbXNnPXFxcTk2MXJhdwppZD0wMDAwMzIgbGV2ZWw9" +
      "NCBtc2c9cXFxMjdyYXcKaWQ9MDAwMDMzIGxldmVsPTUgbXNnPXFxcTkycmF3CmlkPTAwMDAz" +
      "NCBsZXZlbD02IG1zZz1xcXExNTlyYXcKaWQ9MDAwMDM1IGxldmVsPTAgbXNnPXFxcTIyOHJh" +
      "dwppZD0wMDAwMzYgbGV2ZWw9MSBtc2c9cXFxMjk5cmF3CmlkPTAwMDAzNyBsZXZlbD0yIG1z" +
      "Zz1xcXEzNzJyYXcKaWQ9MDAwMDM4IGxldmVsPTMgbXNnPXFxcTQ0N3JhdwppZD0wMDAwMzkg" +
      "bGV2ZWw9NCBtc2c9cXFxNTI0cmF3CmlkPTAwMDA0MCBsZXZlbD01IG1zZz1xcXE2MDNyYXcK" +
      "aWQ9MDAwMDQxIGxldmVsPTYgbXNnPXFxcTY4NHJhdwppZD0wMDAwNDIgbGV2ZWw9MCBtc2c9" +
      "cXFxNzY3cmF3CmlkPTAwMDA0MyBsZXZlbD0xIG1zZz1xcXE4NTJyYXcKaWQ9MDAwMDQ0IGxl" +
      "dmVsPTIgbXNnPXFxcTkzOXJhdwppZD0wMDAwNDUgbGV2ZWw9MyBtc2c9cXFxMzFyYXcKaWQ9" +
      "MDAwMDQ2IGxldmVsPTQgbXNnPXFxcTEyMnJhdwppZD0wMDAwNDcgbGV2ZWw9NSBtc2c9cXFx" +
      "MjE1cmF3CmlkPTAwMDA0OCBsZXZlbD02IG1zZz1xcXEzMTByYXcKaWQ9MDAwMDQ5IGxldmVs" +
      "PTAgbXNnPXFxcTQwN3JhdwppZD0wMDAwNTAgbGV2ZWw9MSBtc2c9cXFxNTA2cmF3CmlkPTAw" +
      "MDA1MSBsZXZlbD0yIG1zZz1xcXE2MDdyYXcKaWQ9MDAwMDUyIGxldmVsPTMgbXNnPXFxcTcx" +
      "MHJhdwppZD0wMDAwNTMgbGV2ZWw9NCBtc2c9cXFxODE1cmF3CmlkPTAwMDA1NCBsZXZlbD01" +
      "IG1zZz1xcXE5MjJyYXcKaWQ9MDAwMDU1IGxldmVsPTYgbXNnPXFxcTM0cmF3CmlkPTAwMDA1" +
      "NiBsZXZlbD0wIG1zZz1xcXExNDVyYXcKaWQ9MDAwMDU3IGxldmVsPTEgbXNnPXFxcTI1OHJh" +
      "dwppZD0wMDAwNTggbGV2ZWw9MiBtc2c9cXFxMzczcmF3CmlkPTAwMDA1OSBsZXZlbD0zIG1z" +
      "Zz1xcXE0OTByYXcKaWQ9MDAwMDYwIGxldmVsPTQgbXNnPXFxcTYwOXJhdwppZD0wMDAwNjEg" +
      "bGV2ZWw9NSBtc2c9cXFxNzMwcmF3CmlkPTAwMDA2MiBsZXZlbD02IG1zZz1xcXE4NTNyYXcK" +
      "aWQ9MDAwMDYzIGxldmVsPTAgbXNnPXFxcTk3OHJhdwppZD0wMDAwNjQgbGV2ZWw9MSBtc2c9" +
      "cXFxMTA4cmF3CmlkPTAwMDA2NSBsZXZlbD0yIG1zZz1xcXEyMzdyYXcKaWQ9MDAwMDY2IGxl" +
      "dmVsPTMgbXNnPXFxcTM2OHJhdwppZD0wMDAwNjcgbGV2ZWw9NCBtc2c9cXFxNTAxcmF3Cmlk" +
      "PTAwMDA2OCBsZXZlbD01IG1zZz1xcXE2MzZyYXcKaWQ9MDAwMDY5IGxldmVsPTYgbXNnPXFx" +
      "cTc3M3JhdwppZD0wMDAwNzAgbGV2ZWw9MCBtc2c9cXFxOTEycmF3CmlkPTAwMDA3MSBsZXZl" +
      "bD0xIG1zZz1xcXE1NnJhdwppZD0wMDAwNzIgbGV2ZWw9MiBtc2c9cXFxMTk5cmF3CmlkPTAw" +
      "MDA3MyBsZXZlbD0zIG1zZz1xcXEzNDRyYXcKaWQ9MDAwMDc0IGxldmVsPTQgbXNnPXFxcTQ5" +
      "MXJhdwppZD0wMDAwNzUgbGV2ZWw9NSBtc2c9cXFxNjQwcmF3CmlkPTAwMDA3NiBsZXZlbD02" +
      "IG1zZz1xcXE3OTFyYXcKaWQ9MDAwMDc3IGxldmVsPTAgbXNnPXFxcTk0NHJhdwppZD0wMDAw" +
      "NzggbGV2ZWw9MSBtc2c9cXFxMTAycmF3CmlkPTAwMDA3OSBsZXZlbD0yIG1zZz1xcXEyNTly" +
      "YXcKaWQ9MDAwMDgwIGxldmVsPTMgbXNnPXFxcTQxOHJhdwppZD0wMDAwODEgbGV2ZWw9NCBt" +
      "c2c9cXFxNTc5cmF3CmlkPTAwMDA4MiBsZXZlbD01IG1zZz1xcXE3NDJyYXcKaWQ9MDAwMDgz" +
      "IGxldmVsPTYgbXNnPXFxcTkwN3JhdwppZD0wMDAwODQgbGV2ZWw9MCBtc2c9cXFxNzdyYXcK" +
      "aWQ9MDAwMDg1IGxldmVsPTEgbXNnPXFxcTI0NnJhdwppZD0wMDAwODYgbGV2ZWw9MiBtc2c9" +
      "cXFxNDE3cmF3CmlkPTAwMDA4NyBsZXZlbD0zIG1zZz1xcXE1OTByYXcKaWQ9MDAwMDg4IGxl" +
      "dmVsPTQgbXNnPXFxcTc2NXJhdwppZD0wMDAwODkgbGV2ZWw9NSBtc2c9cXFxOTQycmF3Cmlk" +
      "PTAwMDA5MCBsZXZlbD02IG1zZz1xcXExMjRyYXcKaWQ9MDAwMDkxIGxldmVsPTAgbXNnPXFx" +
      "cTMwNXJhdwppZD0wMDAwOTIgbGV2ZWw9MSBtc2c9cXFxNDg4cmF3CmlkPTAwMDA5MyBsZXZl" +
      "bD0yIG1zZz1xcXE2NzNyYXcKaWQ9MDAwMDk0IGxldmVsPTMgbXNnPXFxcTg2MHJhdwppZD0w" +
      "MDAwOTUgbGV2ZWw9NCBtc2c9cXFxNTJyYXcKaWQ9MDAwMDk2IGxldmVsPTUgbXNnPXFxcTI0" +
      "M3JhdwppZD0wMDAwOTcgbGV2ZWw9NiBtc2c9cXFxNDM2cmF3CmlkPTAwMDA5OCBsZXZlbD0w" +
      "IG1zZz1xcXE2MzFyYXcKaWQ9MDAwMDk5IGxldmVsPTEgbXNnPXFxcTgyOHJhdwppZD0wMDAx" +
      "MDAgbGV2ZWw9MiBtc2c9cXFxMzByYXcKaWQ9MDAwMTAxIGxldmVsPTMgbXNnPXFxcTIzMXJh" +
      "dwppZD0wMDAxMDIgbGV2ZWw9NCBtc2c9cXFxNDM0cmF3CmlkPTAwMDEwMyBsZXZlbD01IG1z" +
      "Zz1xcXE2MzlyYXcKaWQ9MDAwMTA0IGxldmVsPTYgbXNnPXFxcTg0NnJhdwppZD0wMDAxMDUg" +
      "bGV2ZWw9MCBtc2c9cXFxNThyYXcKaWQ9MDAwMTA2IGxldmVsPTEgbXNnPXFxcTI2OXJhdwpp" +
      "ZD0wMDAxMDcgbGV2ZWw9MiBtc2c9cXFxNDgycmF3CmlkPTAwMDEwOCBsZXZlbD0zIG1zZz1x" +
      "cXE2OTdyYXcKaWQ9MDAwMTA5IGxldmVsPTQgbXNnPXFxcTkxNHJhdwppZD0wMDAxMTAgbGV2" +
      "ZWw9NSBtc2c9cXFxMTM2cmF3CmlkPTAwMDExMSBsZXZlbD02IG1zZz1xcXEzNTdyYXcKaWQ9" +
      "MDAwMTEyIGxldmVsPTAgbXNnPXFxcTU4MHJhdwppZD0wMDAxMTMgbGV2ZWw9MSBtc2c9cXFx" +
      "ODA1cmF3CmlkPTAwMDExNCBsZXZlbD0yIG1zZz1xcXEzNXJhdwppZD0wMDAxMTUgbGV2ZWw9" +
      "MyBtc2c9cXFxMjY0cmF3CmlkPTAwMDExNiBsZXZlbD00IG1zZz1xcXE0OTVyYXcKaWQ9MDAw" +
      "MTE3IGxldmVsPTUgbXNnPXFxcTcyOHJhdwppZD0wMDAxMTggbGV2ZWw9NiBtc2c9cXFxOTYz" +
      "cmF3CmlkPTAwMDExOSBsZXZlbD0wIG1zZz1xcXEyMDNyYXcKaWQ9MDAwMTIwIGxldmVsPTEg" +
      "bXNnPXFxcTQ0MnJhdwppZD0wMDAxMjEgbGV2ZWw9MiBtc2c9cXFxNjgzcmF3CmlkPTAwMDEy" +
      "MiBsZXZlbD0zIG1zZz1xcXE5MjZyYXcKaWQ9MDAwMTIzIGxldmVsPTQgbXNnPXFxcTE3NHJh" +
      "dwppZD0wMDAxMjQgbGV2ZWw9NSBtc2c9cXFxNDIxcmF3CmlkPTAwMDEyNSBsZXZlbD02IG1z" +
      "Zz1xcXE2NzByYXcKaWQ9MDAwMTI2IGxldmVsPTAgbXNnPXFxcTkyMXJhdwppZD0wMDAxMjcg" +
      "bGV2ZWw9MSBtc2c9cXFxMTc3cmF3CmlkPTAwMDEyOCBsZXZlbD0yIG1zZz1xcXE0MzJyYXcK" +
      "aWQ9MDAwMTI5IGxldmVsPTMgbXNnPXFxcTY4OXJhdwppZD0wMDAxMzAgbGV2ZWw9NCBtc2c9" +
      "cXFxOTQ4cmF3CmlkPTAwMDEzMSBsZXZlbD01IG1zZz1xcXEyMTJyYXcKaWQ9MDAwMTMyIGxl" +
      "dmVsPTYgbXNnPXFxcTQ3NXJhdwppZD0wMDAxMzMgbGV2ZWw9MCBtc2c9cXFxNzQwcmF3Cmlk" +
      "PTAwMDEzNCBsZXZlbD0xIG1zZz1xcXExMHJhdwppZD0wMDAxMzUgbGV2ZWw9MiBtc2c9cXFx" +
      "Mjc5cmF3CmlkPTAwMDEzNiBsZXZlbD0zIG1zZz1xcXE1NTByYXcKaWQ9MDAwMTM3IGxldmVs" +
      "PTQgbXNnPXFxcTgyM3JhdwppZD0wMDAxMzggbGV2ZWw9NSBtc2c9cXFxMTAxcmF3CmlkPTAw" +
      "MDEzOSBsZXZlbD02IG1zZz1xcXEzNzhyYXcKaWQ9MDAwMTQwIGxldmVsPTAgbXNnPXFxcTY1" +
      "N3JhdwppZD0wMDAxNDEgbGV2ZWw9MSBtc2c9cXFxOTM4cmF3CmlkPTAwMDE0MiBsZXZlbD0y" +
      "IG1zZz1xcXEyMjRyYXcKaWQ9MDAwMTQzIGxldmVsPTMgbXNnPXFxcTUwOXJhdwppZD0wMDAx" +
      "NDQgbGV2ZWw9NCBtc2c9cXFxNzk2cmF3CmlkPTAwMDE0NSBsZXZlbD01IG1zZz1xcXE4OHJh" +
      "dwppZD0wMDAxNDYgbGV2ZWw9NiBtc2c9cXFxMzc5cmF3CmlkPTAwMDE0NyBsZXZlbD0wIG1z" +
      "Zz1xcXE2NzJyYXcKaWQ9MDAwMTQ4IGxldmVsPTEgbXNnPXFxcTk2N3JhdwppZD0wMDAxNDkg" +
      "bGV2ZWw9MiBtc2c9cXFxMjY3cmF3CmlkPTAwMDE1MCBsZXZlbD0zIG1zZz1xcXE1NjZyYXcK" +
      "aWQ9MDAwMTUxIGxldmVsPTQgbXNnPXFxcTg2N3JhdwppZD0wMDAxNTIgbGV2ZWw9NSBtc2c9" +
      "cXFxMTczcmF3CmlkPTAwMDE1MyBsZXZlbD02IG1zZz1xcXE0NzhyYXcKaWQ9MDAwMTU0IGxl" +
      "dmVsPTAgbXNnPXFxcTc4NXJhdwppZD0wMDAxNTUgbGV2ZWw9MSBtc2c9cXFxOTdyYXcKaWQ9" +
      "MDAwMTU2IGxldmVsPTIgbXNnPXFxcTQwOHJhdwppZD0wMDAxNTcgbGV2ZWw9MyBtc2c9cXFx" +
      "NzIxcmF3CmlkPTAwMDE1OCBsZXZlbD00IG1zZz1xcXEzOXJhdwppZD0wMDAxNTkgbGV2ZWw9" +
      "NSBtc2c9cXFxMzU2cmF3CmlkPTAwMDE2MCBsZXZlbD02IG1zZz1xcXE2NzVyYXcKaWQ9MDAw" +
      "MTYxIGxldmVsPTAgbXNnPXFxcTk5NnJhdwppZD0wMDAxNjIgbGV2ZWw9MSBtc2c9cXFxMzIy" +
      "cmF3CmlkPTAwMDE2MyBsZXZlbD0yIG1zZz1xcXE2NDdyYXcKaWQ9MDAwMTY0IGxldmVsPTMg" +
      "bXNnPXFxcTk3NHJhdwppZD0wMDAxNjUgbGV2ZWw9NCBtc2c9cXFxMzA2cmF3CmlkPTAwMDE2" +
      "NiBsZXZlbD01IG1zZz1xcXE2MzdyYXcKaWQ9MDAwMTY3IGxldmVsPTYgbXNnPXFxcTk3MHJh" +
      "dwppZD0wMDAxNjggbGV2ZWw9MCBtc2c9cXFxMzA4cmF3CmlkPTAwMDE2OSBsZXZlbD0xIG1z" +
      "Zz1xcXE2NDVyYXcKaWQ9MDAwMTcwIGxldmVsPTIgbXNnPXFxcTk4NHJhdwppZD0wMDAxNzEg" +
      "bGV2ZWw9MyBtc2c9cXFxMzI4cmF3CmlkPTAwMDE3MiBsZXZlbD00IG1zZz1xcXE2NzFyYXcK" +
      "aWQ9MDAwMTczIGxldmVsPTUgbXNnPXFxcTE5cmF3CmlkPTAwMDE3NCBsZXZlbD02IG1zZz1x" +
      "cXEzNjZyYXcKaWQ9MDAwMTc1IGxldmVsPTAgbXNnPXFxcTcxNXJhdwppZD0wMDAxNzYgbGV2" +
      "ZWw9MSBtc2c9cXFxNjlyYXcKaWQ9MDAwMTc3IGxldmVsPTIgbXNnPXFxcTQyMnJhdwppZD0w" +
      "MDAxNzggbGV2ZWw9MyBtc2c9cXFxNzc3cmF3CmlkPTAwMDE3OSBsZXZlbD00IG1zZz1xcXEx" +
      "MzdyYXcKaWQ9MDAwMTgwIGxldmVsPTUgbXNnPXFxcTQ5NnJhdwppZD0wMDAxODEgbGV2ZWw9" +
      "NiBtc2c9cXFxODU3cmF3CmlkPTAwMDE4MiBsZXZlbD0wIG1zZz1xcXEyMjNyYXcKaWQ9MDAw" +
      "MTgzIGxldmVsPTEgbXNnPXFxcTU4OHJhdwppZD0wMDAxODQgbGV2ZWw9MiBtc2c9cXFxOTU1" +
      "cmF3CmlkPTAwMDE4NSBsZXZlbD0zIG1zZz1xcXEzMjdyYXcKaWQ9MDAwMTg2IGxldmVsPTQg" +
      "bXNnPXFxcTY5OHJhdwppZD0wMDAxODcgbGV2ZWw9NSBtc2c9cXFxNzRyYXcKaWQ9MDAwMTg4" +
      "IGxldmVsPTYgbXNnPXFxcTQ0OXJhdwppZD0wMDAxODkgbGV2ZWw9MCBtc2c9cXFxODI2cmF3" +
      "CmlkPTAwMDE5MCBsZXZlbD0xIG1zZz1xcXEyMDhyYXcKaWQ9MDAwMTkxIGxldmVsPTIgbXNn" +
      "PXFxcTU4OXJhdwppZD0wMDAxOTIgbGV2ZWw9MyBtc2c9cXFxOTcycmF3CmlkPTAwMDE5MyBs" +
      "ZXZlbD00IG1zZz1xcXEzNjByYXcKaWQ9MDAwMTk0IGxldmVsPTUgbXNnPXFxcTc0N3Jhdwpp" +
      "ZD0wMDAxOTUgbGV2ZWw9NiBtc2c9cXFxMTM5cmF3CmlkPTAwMDE5NiBsZXZlbD0wIG1zZz1x" +
      "cXE1MzByYXcKaWQ9MDAwMTk3IGxldmVsPTEgbXNnPXFxcTkyM3JhdwppZD0wMDAxOTggbGV2" +
      "ZWw9MiBtc2c9cXFxMzIxcmF3CmlkPTAwMDE5OSBsZXZlbD0zIG1zZz1xcXE3MThyYXcKaWQ9" +
      "MDAwMjAwIGxldmVsPTQgbXNnPXFxcTEyMHJhdwppZD0wMDAyMDEgbGV2ZWw9NSBtc2c9cXFx" +
      "NTIxcmF3CmlkPTAwMDIwMiBsZXZlbD02IG1zZz1xcXE5MjRyYXcKaWQ9MDAwMjAzIGxldmVs" +
      "PTAgbXNnPXFxcTMzMnJhdwppZD0wMDAyMDQgbGV2ZWw9MSBtc2c9cXFxNzM5cmF3CmlkPTAw" +
      "MDIwNSBsZXZlbD0yIG1zZz1xcXExNTFyYXcKaWQ9MDAwMjA2IGxldmVsPTMgbXNnPXFxcTU2" +
      "MnJhdwppZD0wMDAyMDcgbGV2ZWw9NCBtc2c9cXFxOTc1cmF3CmlkPTAwMDIwOCBsZXZlbD01" +
      "IG1zZz1xcXEzOTNyYXcKaWQ9MDAwMjA5IGxldmVsPTYgbXNnPXFxcTgxMHJhdwppZD0wMDAy" +
      "MTAgbGV2ZWw9MCBtc2c9cXFxMjMycmF3CmlkPTAwMDIxMSBsZXZlbD0xIG1zZz1xcXE2NTNy" +
      "YXcKaWQ9MDAwMjEyIGxldmVsPTIgbXNnPXFxcTc5cmF3CmlkPTAwMDIxMyBsZXZlbD0zIG1z" +
      "Zz1xcXE1MDRyYXcKaWQ9MDAwMjE0IGxldmVsPTQgbXNnPXFxcTkzMXJhdwppZD0wMDAyMTUg" +
      "bGV2ZWw9NSBtc2c9cXFxMzYzcmF3CmlkPTAwMDIxNiBsZXZlbD02IG1zZz1xcXE3OTRyYXcK" +
      "aWQ9MDAwMjE3IGxldmVsPTAgbXNnPXFxcTIzMHJhdwppZD0wMDAyMTggbGV2ZWw9MSBtc2c9" +
      "cXFxNjY1cmF3CmlkPTAwMDIxOSBsZXZlbD0yIG1zZz1xcXExMDVyYXcKaWQ9MDAwMjIwIGxl" +
      "dmVsPTMgbXNnPXFxcTU0NHJhdwppZD0wMDAyMjEgbGV2ZWw9NCBtc2c9cXFxOTg1cmF3Cmlk" +
      "PTAwMDIyMiBsZXZlbD01IG1zZz1xcXE0MzFyYXcKaWQ9MDAwMjIzIGxldmVsPTYgbXNnPXFx" +
      "cTg3NnJhdwppZD0wMDAyMjQgbGV2ZWw9MCBtc2c9cXFxMzI2cmF3CmlkPTAwMDIyNSBsZXZl" +
      "bD0xIG1zZz1xcXE3NzVyYXcKaWQ9MDAwMjI2IGxldmVsPTIgbXNnPXFxcTIyOXJhdwppZD0w" +
      "MDAyMjcgbGV2ZWw9MyBtc2c9cXFxNjgycmF3CmlkPTAwMDIyOCBsZXZlbD00IG1zZz1xcXEx" +
      "NDByYXcKaWQ9MDAwMjI5IGxldmVsPTUgbXNnPXFxcTU5N3JhdwppZD0wMDAyMzAgbGV2ZWw9" +
      "NiBtc2c9cXFxNTlyYXcKaWQ9MDAwMjMxIGxldmVsPTAgbXNnPXFxcTUyMHJhdwppZD0wMDAy" +
      "MzIgbGV2ZWw9MSBtc2c9cXFxOTgzcmF3CmlkPTAwMDIzMyBsZXZlbD0yIG1zZz1xcXE0NTFy" +
      "YXcKaWQ9MDAwMjM0IGxldmVsPTMgbXNnPXFxcTkxOHJhdwppZD0wMDAyMzUgbGV2ZWw9NCBt" +
      "c2c9cXFxMzkwcmF3CmlkPTAwMDIzNiBsZXZlbD01IG1zZz1xcXE4NjFyYXcKaWQ9MDAwMjM3" +
      "IGxldmVsPTYgbXNnPXFxcTMzN3JhdwppZD0wMDAyMzggbGV2ZWw9MCBtc2c9cXFxODEycmF3" +
      "CmlkPTAwMDIzOSBsZXZlbD0xIG1zZz1xcXEyOTJyYXcKaWQ9MDAwMjQwIGxldmVsPTIgbXNn" +
      "PXFxcTc3MXJhdwppZD0wMDAyNDEgbGV2ZWw9MyBtc2c9cXFxMjU1cmF3CmlkPTAwMDI0MiBs" +
      "ZXZlbD00IG1zZz1xcXE3MzhyYXcKaWQ9MDAwMjQzIGxldmVsPTUgbXNnPXFxcTIyNnJhdwpp" +
      "ZD0wMDAyNDQgbGV2ZWw9NiBtc2c9cXFxNzEzcmF3CmlkPTAwMDI0NSBsZXZlbD0wIG1zZz1x" +
      "cXEyMDVyYXcKaWQ9MDAwMjQ2IGxldmVsPTEgbXNnPXFxcTY5NnJhdwppZD0wMDAyNDcgbGV2" +
      "ZWw9MiBtc2c9cXFxMTkycmF3CmlkPTAwMDI0OCBsZXZlbD0zIG1zZz1xcXE2ODdyYXcKaWQ9" +
      "MDAwMjQ5IGxldmVsPTQgbXNnPXFxcTE4N3JhdwppZD0wMDAyNTAgbGV2ZWw9NSBtc2c9cXFx" +
      "Njg2cmF3CmlkPTAwMDI1MSBsZXZlbD02IG1zZz1xcXExOTByYXcKaWQ9MDAwMjUyIGxldmVs" +
      "PTAgbXNnPXFxcTY5M3JhdwppZD0wMDAyNTMgbGV2ZWw9MSBtc2c9cXFxMjAxcmF3CmlkPTAw" +
      "MDI1NCBsZXZlbD0yIG1zZz1xcXE3MDhyYXcKaWQ9MDAwMjU1IGxldmVsPTMgbXNnPXFxcTIy" +
      "MHJhdwppZD0wMDAyNTYgbGV2ZWw9NCBtc2c9cXFxNzMxcmF3CmlkPTAwMDI1NyBsZXZlbD01" +
      "IG1zZz1xcXEyNDdyYXcKaWQ9MDAwMjU4IGxldmVsPTYgbXNnPXFxcTc2MnJhdwppZD0wMDAy" +
      "NTkgbGV2ZWw9MCBtc2c9cXFxMjgycmF3CmlkPTAwMDI2MCBsZXZlbD0xIG1zZz1xcXE4MDFy" +
      "YXcKaWQ9MDAwMjYxIGxldmVsPTIgbXNnPXFxcTMyNXJhdwppZD0wMDAyNjIgbGV2ZWw9MyBt" +
      "c2c9cXFxODQ4cmF3CmlkPTAwMDI2MyBsZXZlbD00IG1zZz1xcXEzNzZyYXcKaWQ9MDAwMjY0" +
      "IGxldmVsPTUgbXNnPXFxcTkwM3JhdwppZD0wMDAyNjUgbGV2ZWw9NiBtc2c9cXFxNDM1cmF3" +
      "CmlkPTAwMDI2NiBsZXZlbD0wIG1zZz1xcXE5NjZyYXcKaWQ9MDAwMjY3IGxldmVsPTEgbXNn" +
      "PXFxcTUwMnJhdwppZD0wMDAyNjggbGV2ZWw9MiBtc2c9cXFxNDByYXcKaWQ9MDAwMjY5IGxl" +
      "dmVsPTMgbXNnPXFxcTU3N3JhdwppZD0wMDAyNzAgbGV2ZWw9NCBtc2c9cXFxMTE5cmF3Cmlk" +
      "PTAwMDI3MSBsZXZlbD01IG1zZz1xcXE2NjByYXcKaWQ9MDAwMjcyIGxldmVsPTYgbXNnPXFx" +
      "cTIwNnJhdwppZD0wMDAyNzMgbGV2ZWw9MCBtc2c9cXFxNzUxcmF3CmlkPTAwMDI3NCBsZXZl" +
      "bD0xIG1zZz1xcXEzMDFyYXcKaWQ9MDAwMjc1IGxldmVsPTIgbXNnPXFxcTg1MHJhdwppZD0w" +
      "MDAyNzYgbGV2ZWw9MyBtc2c9cXFxNDA0cmF3CmlkPTAwMDI3NyBsZXZlbD00IG1zZz1xcXE5" +
      "NTdyYXcKaWQ9MDAwMjc4IGxldmVsPTUgbXNnPXFxcTUxNXJhdwppZD0wMDAyNzkgbGV2ZWw9" +
      "NiBtc2c9cXFxNzVyYXcKaWQ9MDAwMjgwIGxldmVsPTAgbXNnPXFxcTYzNHJhdwppZD0wMDAy" +
      "ODEgbGV2ZWw9MSBtc2c9cXFxMTk4cmF3CmlkPTAwMDI4MiBsZXZlbD0yIG1zZz1xcXE3NjFy" +
      "YXcKaWQ9MDAwMjgzIGxldmVsPTMgbXNnPXFxcTMyOXJhdwppZD0wMDAyODQgbGV2ZWw9NCBt" +
      "c2c9cXFxODk2cmF3CmlkPTAwMDI4NSBsZXZlbD01IG1zZz1xcXE0NjhyYXcKaWQ9MDAwMjg2" +
      "IGxldmVsPTYgbXNnPXFxcTQycmF3CmlkPTAwMDI4NyBsZXZlbD0wIG1zZz1xcXE2MTVyYXcK" +
      "aWQ9MDAwMjg4IGxldmVsPTEgbXNnPXFxcTE5M3JhdwppZD0wMDAyODkgbGV2ZWw9MiBtc2c9" +
      "cXFxNzcwcmF3CmlkPTAwMDI5MCBsZXZlbD0zIG1zZz1xcXEzNTJyYXcKaWQ9MDAwMjkxIGxl" +
      "dmVsPTQgbXNnPXFxcTkzM3JhdwppZD0wMDAyOTIgbGV2ZWw9NSBtc2c9cXFxNTE5cmF3Cmlk" +
      "PTAwMDI5MyBsZXZlbD02IG1zZz1xcXExMDdyYXcKaWQ9MDAwMjk0IGxldmVsPTAgbXNnPXFx" +
      "cTY5NHJhdwppZD0wMDAyOTUgbGV2ZWw9MSBtc2c9cXFxMjg2cmF3CmlkPTAwMDI5NiBsZXZl" +
      "bD0yIG1zZz1xcXE4NzdyYXcKaWQ9MDAwMjk3IGxldmVsPTMgbXNnPXFxcTQ3M3JhdwppZD0w" +
      "MDAyOTggbGV2ZWw9NCBtc2c9cXFxNzFyYXcKaWQ9MDAwMjk5IGxldmVsPTUgbXNnPXFxcTY2" +
      "OHJhdw==",
     "G1klIqo1GcCRYOMo91byWJXW5qRB65b0IR6wwQjfslk7jGzuDlR0A5pZevJA31rrkBPMIw/j" +
      "n38XTW/ZrzIPc89KW6sIpkwNUxdQpiKyCBT7XtjTHXv4fc/9+fzwfZ/9fv/e988/N4DYAOU2" +
      "SG1lnA98WLe4WJdMfDXlRHmoPB8WnvrhvQMyRcBszaC4XCavalYMcnFYaxLVlXOGODR7Nhaf" +
      "HvMeyKsBDOoGybEsE1XMOsNcnK2Y6BGWy6sbKq43WHpy9D0QlQGdDwNyqzxyP7/Ql02t5LW8" +
      "tqmoMHXOJNXXzXn6KQf6JofGyZG3zJlLlbMPgVtXkDmR2JxTeDl1XnKf+5wL/ZJLg5er47D7" +
      "x/jl5O5vDbkWs71Z93pvjXq79qWffk3D6KXprdKyufSId+mVStu/faTjPqRPy+maKPMs2MEX" +
      "MhRtRmomM06RWT0v45t8x21iZzInHjOV27634vJw2fRxHebJvuTN7yR5K8d5vgzy4vblnfHm" +
      "1Q6zT3CyUG+zPOYut4qOsuP5Zff3MlnLUTaOnD0tZMvx3uK9h96VWxQKb/HIaN7iCatv8YYb" +
      "v8Xbxx735uHuPjyO3B6HG24LxbwF3gGZW3Bowy059h73eoPr28Z83MaunobXbiKGlzhrJfrg" +
      "4798OsMkDp+45Syd1AVJjkMkV+clfZTgNhNJ817U7HptvXUuBQmm6GRTumRS8xP95s/LkjbE" +
      "7muIoxoCDw2hXGPwpjFHde4HOY1hXxtD6sY87tyL0sbgsDHUaQx0GsvajeWcxoKosUzuE+zj" +
      "1r2Pxr3Mu8YSorEPlX3RumGcbZjWDSOyYTxpmGYaPvS8vVhpmOY1jN41rGfnHL1hP8Wbo4M5" +
      "P5A5F3nOEWz2+Zo5l+GcSzJHKPNdpvO93nySms+9m+/RZT7FzKd7ffl7mM+ZzufRc+W7ue51" +
      "rg3nKr+5ZjJXqHNdvbmWmquIuQTXfICv+Vii+Sin+ZDYfEfUO/uARfOxZvPRbPOhqvk4vCag" +
      "2AReNfFI+50fpgkqNHHIci/pNAH1msDeJsDbJtmZJultk4zQJBc3iegmj2TZD7JN4mOTB+ax" +
      "H9s09dh2L8vXFD01xSyaorimUF9TnNEUUpriwKZg2RwSNAfuNofomnOQdi+BmrPyfcb5YfZb" +
      "0easvuasuOauvuaCvuaubnPhQ3PJu+ZCvuYSobkHJ+xHzObCY9PcQ9OI2zQ31zSKm6ZPTTPa" +
      "pqndNPvY9GNe97rJHIHO0X5z5PMcs5ijHuZ4++Y4b+bYzRwXO+dHuL9qzXyi18eHsb2Knc+r" +
      "53N88z2G7tXY+UQ1n8mbq5ZzrTTXReeKl7m6M1ee53rJXCea+wjY94/fIA=="),
    ("cjk", "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG" +
      "44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi" +
      "5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K5" +
      "44OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X" +
      "44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI" +
      "5ryi5a2X44OG44K544OI5ryi5a2X44OG44K544OI",
     "G7cL+I2UbsI8UOWAfUuWgV3oSs2form88WAI0NgAwO92cFC4"),
    ("dicty", "dGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxl" +
      "LmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5k" +
      "IGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBk" +
      "b3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8g" +
      "cHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEg" +
      "aHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxp" +
      "ZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGlj" +
      "IHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDov" +
      "L3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVm" +
      "dCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsg" +
      "c3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5l" +
      "eGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUg" +
      "b2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUg" +
      "dGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxl" +
      "LmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5k" +
      "IGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBk" +
      "b3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8g" +
      "cHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEg" +
      "aHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxp" +
      "ZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGlj" +
      "IHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDov" +
      "L3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVm" +
      "dCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsg" +
      "c3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5l" +
      "eGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUg" +
      "b2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUg" +
      "dGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxl" +
      "LmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5k" +
      "IGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBk" +
      "b3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8g" +
      "cHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEg" +
      "aHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxp" +
      "ZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGlj" +
      "IHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDov" +
      "L3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVm" +
      "dCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsg" +
      "c3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5l" +
      "eGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUg" +
      "b2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUg" +
      "dGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxl" +
      "LmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5k" +
      "IGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBk" +
      "b3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8g" +
      "cHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEg" +
      "aHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxp" +
      "ZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGlj" +
      "IHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDov" +
      "L3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVm" +
      "dCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsg" +
      "c3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5l" +
      "eGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUg" +
      "b2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUg" +
      "dGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxl" +
      "LmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5k" +
      "IGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUgdGltZSBk" +
      "b3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEgaHR0cDovL3d3dy5leGFtcGxlLmNvbS8g" +
      "cHVibGljIHdvcmsgc3RhdGUgdGltZSBkb3duIGxpZmUgbGVmdCB0aGUgb2YgYW5kIGlzIGEg" +
      "aHR0cDovL3d3dy5leGFtcGxlLmNvbS8gcHVibGljIHdvcmsgc3RhdGUg",
     "Gy8MCBwJdqzJWqcOQxmW9tYgd2QuG8TMbQ445IC97Es0IAyccxsbV8SpjV5QLwEYEt/gXLqG" +
      "0261Gbh3eLEtLjrnAIAo"))

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  test("real libbrotli vectors decode bit-exactly") {
    Vectors.foreach { case (name, rawB64, brB64) =>
      val raw = b64(rawB64)
      val got = Brotli.inflate(b64(brB64))
      assert(java.util.Arrays.equals(got, raw),
        s"vector $name: ${got.length} vs ${raw.length} bytes")
    }
  }

  test("fixture encoders round-trip (stored and compressed-literal)") {
    val rnd = new scala.util.Random(42)
    val sizes = Seq(0, 1, 2, 7, 100, 1000, 65535, 65536, 70000)
    for (n <- sizes) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      assert(java.util.Arrays.equals(
        Brotli.inflate(Brotli.deflateStored(data)), data), s"stored $n")
      assert(java.util.Arrays.equals(
        Brotli.inflate(Brotli.deflateLiteral(data)), data), s"literal $n")
    }
  }

  test("malformed input throws loudly, never decodes garbage") {
    // truncated mid-stream
    val ok = Brotli.deflateLiteral("hello brotli world".getBytes)
    intercept[IllegalArgumentException] {
      Brotli.inflate(ok.take(ok.length - 4))
    }
    // reserved window code: first bits 1,000,001 (LSB-first 0x11)
    intercept[IllegalArgumentException] {
      Brotli.inflate(Array(0x11.toByte, 0x00.toByte))
    }
    // empty input
    intercept[IllegalArgumentException] { Brotli.inflate(Array[Byte]()) }
    // bit-flip inside a committed complex-code vector must throw or
    // mis-decode -- never SILENTLY return the original
    val (_, rawB64, brB64) = Vectors.find(_._1 == "log").get
    val c = b64(brB64); c(40) = (c(40) ^ 0x10).toByte
    val r = try Some(Brotli.inflate(c)) catch { case _: Exception => None }
    assert(!r.exists(java.util.Arrays.equals(_, b64(rawB64))))
  }

  test("expression path: codegen inflate + deflate, NULL propagation") {
    import spark.implicits._
    val texts = Seq("plain body", "", "\u00e9\u00fc utf-8 bytes", "a" * 10000)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .withColumn("bytes", encode(col("t"), "UTF-8"))
      .withColumn("br_stored", BrotliCols.deflateCol(col("bytes")))
      .withColumn("br_lit", BrotliCols.deflateCol(col("bytes"), literal = true))
      .withColumn("rt1", decode(BrotliCols.inflateCol(col("br_stored")), "UTF-8"))
      .withColumn("rt2", decode(BrotliCols.inflateCol(col("br_lit")), "UTF-8"))
    val rows = df.select("t", "rt1", "rt2").collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0))
      assert(r.getString(2) == r.getString(0))
    }
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(null)),
      StructType(Seq(StructField("b", BinaryType))))
    assert(withNull.select(BrotliCols.inflateCol(col("b"))).head.isNullAt(0))
  }

  test("decodeContentCoding routes br through the brotli inflate") {
    import spark.implicits._
    val df = Seq(("br body \u00e9", "br"), ("id body", ""))
      .toDF("t", "enc")
      .withColumn("bytes", encode(col("t"), "UTF-8"))
      .withColumn("wire", when(col("enc") === "br",
        BrotliCols.deflateCol(col("bytes"), literal = true))
        .otherwise(col("bytes")))
      .withColumn("back", decode(
        graft.sources.Warc.decodeContentCoding(col("wire"), col("enc")),
        "UTF-8"))
    df.select("t", "back").collect().foreach { r =>
      assert(r.getString(1) == r.getString(0))
    }
  }
}
