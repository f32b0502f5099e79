package graft.search

import graft.QuerySpec

/** The fixed 20-query reference set (FIXTURES.md §3), ASCII-identifier
  * domain. q09–q18 probe the Zipf df spectrum: `ident_NNNN` ranks from the
  * red-hot head to the cold tail of the 5000-identifier vocabulary.
  */
object ReferenceQueries {

  val all: Seq[QuerySpec] = Seq(
    QuerySpec("q01", should = Seq("return")), // hot keyword, df ~ corpus-wide
    QuerySpec("q02", should = Seq("qzx_handler_77")), // planted needle
    QuerySpec("q03", should = Seq("match", "ident_0007")), // 2-term OR
    QuerySpec("q04", must = Seq("while", "ident_0003")), // 2-term AND
    QuerySpec("q05", should = Seq("if", "ident_0042", "qzx_handler_77")), // mixed df OR (stopword dropped)
    QuerySpec("q06", should = Seq("the", "ident_0011")), // stopword dropped
    QuerySpec("q07", must = Seq("import"), mustNot = Seq("ident_0001")), // AND NOT
    QuerySpec("q08", should = Seq("match"), langFilter = Some("scala")), // metadata filter
    QuerySpec("q09", should = Seq("ident_0000")), // df decile probes…
    QuerySpec("q10", should = Seq("ident_0004")),
    QuerySpec("q11", should = Seq("ident_0009")),
    QuerySpec("q12", should = Seq("ident_0049")),
    QuerySpec("q13", should = Seq("ident_0099")),
    QuerySpec("q14", should = Seq("ident_0499", "ident_0100")),
    QuerySpec("q15", should = Seq("ident_0999", "return")),
    QuerySpec("q16", should = Seq("ident_2499", "ident_0024")),
    QuerySpec("q17", should = Seq("ident_3999", "ident_0001", "ident_0201")),
    QuerySpec("q18", should = Seq("ident_4999", "vqk_sentinel_13")),
    QuerySpec("q19", should = Seq("the", "of", "and")), // all stopwords -> empty
    QuerySpec("q20", should = Seq("zzznotaterm"))) // absent term -> empty
}
