package graft.search

import org.scalatest.funsuite.AnyFunSuite
import QueryParser._

/** Grammar conformance for the Lucene query-language parser against the
  * locally witnessed public grammar's own test corpus
  * [G /usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/examples/lucene_grammar.py
  * 75-278 (accept), 280-313 (reject)] — the success strings come from the
  * Lucene query-parser syntax doc + TestQueryParser.java per [G 74].
  */
/** The grammar corpus, shared: IndexEndToEndSpec lowers + executes
  * every accept case through QueryLowering/searchTree (VERDICT r2
  * next-1 done-criterion).
  */
object GrammarCorpus {
  // [G 75-278] success tests, verbatim (comments stripped)
  val accepts: Seq[String] = raw"""
a and b
a and not b
a and !b
a && !b
a&&!b
name:a
name:a and not title:b
(a^100 c d f) and !z
name:"blah de blah"
title:(+return +"pink panther")
title:"The Right Way" AND text:go
title:"Do it right" AND right
title:Do it right
te?t
test*
te*t
roam~
roam~0.8
"jakarta apache"~10
mod_date:[20020101 TO 20030101]
title:{Aida TO Carmen}
jakarta apache
jakarta^4 apache
"jakarta apache"^4 "Apache Lucene"
"jakarta apache" jakarta
"jakarta apache" OR jakarta
"jakarta apache" AND "Apache Lucene"
+jakarta lucene
"jakarta apache" NOT "Apache Lucene"
"jakarta apache" -"Apache Lucene"
(jakarta OR apache) AND website
title:(+return +"pink panther")
\(1+1\)\:2
c\:\\windows
(fieldX:xxxxx OR fieldy:xxxxxxxx)^2 AND (fieldx:the OR fieldy:foo)
(fieldX:xxxxx fieldy:xxxxxxxx)^2 AND (fieldx:the fieldy:foo)
(fieldX:xxxxx~0.5 fieldy:xxxxxxxx)^2 AND (fieldx:the fieldy:foo)
+term -term term
foo:term AND field:anotherTerm
germ term^2.0
(term)^2.0
(foo OR bar) AND (baz OR boo)
+(apple \"steve jobs\") -(foo bar baz)
+title:(dog OR cat) -author:\"bob dole\"
a AND b
+a +b
(a AND b)
c OR (a AND b)
c (+a +b)
a AND NOT b
+a -b
a AND -b
a AND !b
a && b
a && ! b
a OR b
a b
a || b
a OR !b
a -b
a OR ! b
a OR -b
a - b
a + b
a ! b
+foo:term +anotherterm
hello
term^2.0
(germ term)^2.0
term^2
+(foo bar) +(baz boo)
((a OR b) AND NOT c) OR d
(+(a b) -c) d
field
a&&b
.NET
term
germ
3
term 1.0 1 2
term term1 term2
term term term
term*
term*^2
term*^2.0
term~
term~2.0
term~0.7
term~^3
term~2.0^3.0
term*germ
term*germ^3
term*germ^3.0
term~1.1
[A TO C]
t*erm*
term term^3.0 term
term stop^3.0 term
term +stop term
term -stop term
drop AND (stop) AND roll
+drop +roll
term +(stop) term
term -(stop) term
drop AND stop AND roll
term phrase term
term (phrase1 phrase2) term
term AND NOT phrase term
+term -(phrase1 phrase2) term
stop^3
stop
(stop)^3
((stop))^3
(stop^3)
((stop)^3)
(stop)
((stop))
term +stop
[ a TO z]
[a TO z]
[ a TO z ]
{ a TO z}
{a TO z}
{ a TO z }
{ a TO z }^2.0
{a TO z}^2.0
[ a TO z] OR bar
[a TO z] bar
[ a TO z] AND bar
+[a TO z] +bar
( bar blar { a TO z})
bar blar {a TO z}
gack ( bar blar { a TO z})
gack (bar blar {a TO z})
[\* TO \*]
\!blah
\:blah
blah
\~blah
\*blah
a
a-b:c
a+b:c
a\:b:c
a\\b:c
a:b-c
a:b+c
a:b\:c
a:b\\c
a:b-c*
a:b+c*
a:b\:c*
a:b\\c*
a:b-c~2.0
a:b+c~2.0
a:b\:c~
a:b\\c~
[a- TO a+]
[ a\\ TO a\* ]
c\:\\temp\\\~foo.txt
abc
XYZ
(item:\\ item:ABCD\\)
\*
blah*blah
blah?blah
\\
\||
\&&
a\:b\:c
a\\b\:c
a\:b\\c
a\:b\:c\*
a\:b\\\\c\*
a:b-c~
a:b+c~
a\:b\:c\~
a\:b\\c\~
+weltbank +worlbank
+term +term +term
term +term term
term term +term
term +term +term
-term term term
-term +term +term
on
on^1.0
hello^2.0
the^3
the
some phrase
xunit~
one two three
A AND B OR C AND D
+A +B +C +D
foo:zoo*
foo:zoo*^2
zoo
a:the OR a:foo
a:woo OR a:the
"the wizard of ozzy"
""".split('\n').map(_.trim).filter(_.nonEmpty).toSeq
}

class QueryParserSpec extends AnyFunSuite {

  private val accepts = GrammarCorpus.accepts

  // [G 280-313] failure tests, verbatim (comments stripped)
  private val rejects: Seq[String] = raw"""
field:term:with:colon some more terms
(sub query)^5.0^2.0 plus more
*term1 AND term2
?term3 OR term4
*
[* TO Z]
[* TO z]
[A TO *]
[a TO *]
[* TO *]
foo:*
foo:*^2
*:foo
*:*
(*:*)
+*:* -*:*
a:b:c
a:b:c~
a:b:c*
a:b:c~2.0
""".split('\n').map(_.trim).filter(_.nonEmpty).toSeq

  test(s"grammar conformance: ${accepts.size} accept cases [G 75-278]") {
    assert(accepts.size >= 50)
    val failures = accepts.flatMap(q => tryParse(q).left.toOption.map(e => s"'$q': $e"))
    assert(failures.isEmpty, s"should parse but did not:\n${failures.mkString("\n")}")
  }

  test(s"grammar conformance: ${rejects.size} reject cases [G 280-313]") {
    assert(rejects.size >= 20)
    val wrongly = rejects.filter(q => tryParse(q).isRight)
    assert(wrongly.isEmpty, s"should fail but parsed:\n${wrongly.mkString("\n")}")
  }

  test("AST shapes: modifiers, fields, boosts, fuzzy, phrase, range") {
    assert(parse("+merge window^2.5 -error") ==
      QOr(Seq(QRequired(QTerm(None, "merge")),
        QTerm(None, "window", boost = Some(2.5)),
        QProhibited(QTerm(None, "error")))))
    assert(parse("name:a and not title:b") ==
      QAnd(Seq(QTerm(Some("name"), "a"), QNot(QTerm(Some("title"), "b")))))
    assert(parse("roam~0.8") == QTerm(None, "roam", fuzzy = Some(0.8)))
    assert(parse("roam~") == QTerm(None, "roam", fuzzy = Some(0.5)))
    assert(parse("\"jakarta apache\"~10") ==
      QPhrase(None, "jakarta apache", proximity = Some(10)))
    assert(parse("mod_date:[20020101 TO 20030101]") ==
      QRange(Some("mod_date"), "20020101", "20030101", inclusive = true))
    assert(parse("title:{Aida TO Carmen}") ==
      QRange(Some("title"), "Aida", "Carmen", inclusive = false))
    assert(parse("te?t") == QTerm(None, "te?t", wildcard = true))
    assert(parse("c\\:\\\\windows") == QTerm(None, "c:\\windows"))
    // escaped wildcard is NOT a wildcard
    assert(parse("\\*blah") == QTerm(None, "*blah"))
    // precedence: A AND B OR C AND D == (A AND B) OR (C AND D)
    assert(parse("A AND B OR C AND D") ==
      QOr(Seq(QAnd(Seq(QTerm(None, "A"), QTerm(None, "B"))),
        QAnd(Seq(QTerm(None, "C"), QTerm(None, "D"))))))
  }

  test("lowering to QuerySpec: executable subset") {
    val spec = parseToSpec("+merge window^2.5 -error", "q")
    assert(spec.must == Seq("merge"))
    assert(spec.should == Seq("window"))
    assert(spec.mustNot == Seq("error"))
    assert(spec.boosts == Map("window" -> 2.5))

    val f = parseToSpec("scan table +lang:en", "q2")
    assert(f.should == Seq("scan", "table") && f.langFilter == Some("en"))
    assert(f.must.isEmpty)

    val andSpec = parseToSpec("stream AND batch", "q3")
    assert(andSpec.must == Seq("stream", "batch") && andSpec.should.isEmpty)

    val notSpec = parseToSpec("join NOT error", "q4")
    assert(notSpec.should == Seq("join") && notSpec.mustNot == Seq("error"))

    // terms normalize to lowercase like the analyzer
    assert(parseToSpec("MERGE Sort", "q5").should == Seq("merge", "sort"))

    // unsupported-for-execution shapes are explicit Lefts, not surprises
    assert(lower(parse("te?t"), "w").isLeft)
    assert(lower(parse("\"a phrase\""), "p").isLeft)
    assert(lower(parse("[a TO z]"), "r").isLeft)
    assert(lower(parse("roam~"), "z").isLeft)
    // nested boolean shapes the flat QuerySpec cannot express must REJECT,
    // not silently flatten with inverted semantics
    assert(lower(parse("a AND (b OR c)"), "n1").isLeft)
    assert(lower(parse("c OR (a AND b)"), "n2").isLeft)
    assert(lower(parse("A AND B OR C AND D"), "n3").isLeft)
    assert(lower(parse("+(a b)"), "n4").isLeft)
    // ...while equivalent flat shapes still lower
    assert(parseToSpec("(stream AND batch)", "g1").must == Seq("stream", "batch"))
    assert(parseToSpec("a (b c)", "g2").should == Seq("a", "b", "c"))
  }
}

/** Unit tests for the chunked bucket-filter channel reassembly. */
class FilterChannelSpec extends AnyFunSuite {
  test("assembleFilters concatenates chunks sorted, grouped by lang") {
    def bf(lang: String, chunk: Long, ids: Long*) =
      BucketFilter(0, lang, chunk, ids.toArray)
    // chunks arrive unordered (shuffle order is arbitrary)
    val rows = Iterator(
      bf("en", 2L, 131072L, 131080L),
      bf("en", 0L, 5L, 9L),
      bf("fr", 1L, 65536L),
      bf("en", 1L, 65540L, 70000L))
    val m = QueryEngine.assembleFilters(rows)
    assert(m("en").toSeq == Seq(5L, 9L, 65540L, 70000L, 131072L, 131080L))
    assert(m("fr").toSeq == Seq(65536L))
    // binary-search ready: strictly ascending
    m.values.foreach(a => assert(a.toSeq == a.toSeq.sorted))
  }
}
