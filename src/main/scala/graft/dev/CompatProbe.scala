package graft.dev

import graft.avro.SchemaCompat

/** Dev probe: prints avro-1.12's raw incompatibility (type, location,
  * message) triples for the union-coverage cases the r17 pre-flight gate
  * must classify (ADVICE r16 #1). Run: sbt "runMain graft.dev.CompatProbe".
  */
object CompatProbe {
  private def show(tag: String, reader: String, writer: String): Unit = {
    println(s"== $tag ==")
    SchemaCompat.incompatibilities(reader, writer).foreach(i => println("  " + i))
    println(s"  total-gated: ${SchemaCompat.totalIncompatibilities(reader, writer)}")
  }

  def main(args: Array[String]): Unit = {
    def rec(fields: String) =
      s"""{"type":"record","name":"R","fields":[$fields]}"""

    // A: reader PLAIN int vs writer union ["null","string"] — every
    // branch mismatches; every record fails. The ADVICE case.
    show("A reader plain int / writer [null,string]",
      rec("""{"name":"f","type":"int"}"""),
      rec("""{"name":"f","type":["null","string"],"default":null}"""))

    // B: reader PLAIN long vs writer union ["int","long"] — reader can
    // read BOTH branches via promotion; compatible, nothing gated.
    show("B reader plain long / writer [int,long]",
      rec("""{"name":"f","type":"long"}"""),
      rec("""{"name":"f","type":["int","long"]}"""))

    // C: reader PLAIN int vs writer union ["null","int"] — null branch
    // mismatches, int branch fine: data-dependent (only null-carrying
    // records fail) — must stay skippable.
    show("C reader plain int / writer [null,int]",
      rec("""{"name":"f","type":"int"}"""),
      rec("""{"name":"f","type":["null","int"],"default":null}"""))

    // D: reader union ["null","int"] vs writer union ["string","bytes"]
    // — reader lacks EVERY writer branch; every record fails.
    show("D reader [null,int] / writer [string,bytes]",
      rec("""{"name":"f","type":["null","int"],"default":null}"""),
      rec("""{"name":"f","type":["string","bytes"]}"""))

    // E: reader union ["null","int"] vs writer union ["null","string"]
    // — null branch resolves, string branch missing: data-dependent.
    show("E reader [null,int] / writer [null,string]",
      rec("""{"name":"f","type":["null","int"],"default":null}"""),
      rec("""{"name":"f","type":["null","string"],"default":null}"""))

    // F: two fields, one total-union-mismatch one fine — location
    // grouping must key per field path.
    show("F two fields, f total / g fine",
      rec("""{"name":"f","type":"int"},{"name":"g","type":"string"}"""),
      rec("""{"name":"f","type":["null","string"],"default":null},{"name":"g","type":"string"}"""))

    // G: NESTED — record field r.x with reader plain int vs writer
    // [null,string]: parent location is deeper than /fields/N/type.
    show("G nested reader plain int / writer [null,string]",
      rec("""{"name":"r","type":{"type":"record","name":"S","fields":[{"name":"x","type":"int"}]}}"""),
      rec("""{"name":"r","type":{"type":"record","name":"S","fields":[{"name":"x","type":["null","string"],"default":null}]}}"""))

    // H: array items: reader array<int> vs writer array<[null,string]>.
    show("H array items reader int / writer [null,string]",
      rec("""{"name":"a","type":{"type":"array","items":"int"}}"""),
      rec("""{"name":"a","type":{"type":"array","items":["null","string"]}}"""))

    // I: reader [null,long] vs writer [null,int,string]: null+int resolve
    // (promotion), string missing → 1 of 3 branches — skippable.
    show("I reader [null,long] / writer [null,int,string]",
      rec("""{"name":"f","type":["null","long"],"default":null}"""),
      rec("""{"name":"f","type":["null","int","string"],"default":null}"""))

    // J: FIELD ORDER differs — writer [a, b] with b the total-mismatch
    // union; reader [b, a]. Which side's field index does the location
    // carry? (Decides which schema the gate navigates.)
    show("J reordered fields: reader [b:int, a:string] / writer [a:string, b:[null,string]]",
      rec("""{"name":"b","type":"int"},{"name":"a","type":"string"}"""),
      rec("""{"name":"a","type":"string"},{"name":"b","type":["null","string"],"default":null}"""))

    // K: map values: reader map<int> vs writer map<[null,string]>.
    show("K map values reader int / writer [null,string]",
      rec("""{"name":"m","type":{"type":"map","values":"int"}}"""),
      rec("""{"name":"m","type":{"type":"map","values":["null","string"]}}"""))

    // L: fixed size mismatch — every record fails (total).
    show("L reader fixed(8) / writer fixed(16)",
      rec("""{"name":"f","type":{"type":"fixed","name":"F","size":8}}"""),
      rec("""{"name":"f","type":{"type":"fixed","name":"F","size":16}}"""))

    // M: reader enum shares NO symbol with the writer (no default) —
    // every record fails (total).
    show("M reader enum [A] / writer enum [B,C]",
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["A"]}}"""),
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["B","C"]}}"""))

    // N: reader enum lacks ONE writer symbol — only records carrying it
    // fail (data-dependent, skippable).
    show("N reader enum [A,B] / writer enum [A,B,C]",
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}}"""),
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B","C"]}}"""))

    // O: reader enum lacks symbols but declares a DEFAULT — resolution
    // maps unknowns to it; expect compatible.
    show("O reader enum [A] default A / writer enum [A,B,C]",
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["A"],"default":"A"}}"""),
      rec("""{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B","C"]}}"""))

    // P: missing-default READER field inside a union BRANCH record —
    // only records carrying that branch fail (data-dependent): the
    // unconditional READER_FIELD_MISSING_DEFAULT_VALUE gate would
    // over-gate this.
    show("P missing-default field inside a union branch record",
      rec("""{"name":"o","type":["null",{"type":"record","name":"S","fields":[
             {"name":"x","type":"int"},{"name":"y","type":"int"}]}],"default":null}"""),
      rec("""{"name":"o","type":["null",{"type":"record","name":"S","fields":[
             {"name":"x","type":"int"}]}],"default":null}"""))

    // Q: record-name mismatch inside a union branch — data-dependent
    // for the same reason.
    show("Q name mismatch inside a union branch",
      rec("""{"name":"o","type":["null",{"type":"record","name":"T","fields":[
             {"name":"x","type":"int"}]}],"default":null}"""),
      rec("""{"name":"o","type":["null",{"type":"record","name":"S","fields":[
             {"name":"x","type":"int"}]}],"default":null}"""))

    // R: fixed-size mismatch nested INSIDE a union branch — skippable.
    show("R fixed mismatch inside a union branch",
      rec("""{"name":"o","type":["null",{"type":"fixed","name":"F","size":8}],"default":null}"""),
      rec("""{"name":"o","type":["null",{"type":"fixed","name":"F","size":16}],"default":null}"""))
  }
}
