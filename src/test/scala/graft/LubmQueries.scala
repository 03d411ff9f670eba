package graft

/** The 14 standard LUBM queries (no-inference variant; Guo, Pan &
  * Heflin, JWS 2005) shared by [[LubmSpec]] (golden parity at one
  * university) and [[Lubm10Spec]] (skolem-offset clone scaling).
  */
private[graft] object LubmQueries {
  val prologue: String =
    """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |PREFIX ub: <http://swat.cse.lehigh.edu/onto/univ-bench.owl#>
      |""".stripMargin

  val queries: Seq[String] = Seq(
    """SELECT ?X WHERE {
      |  ?X ub:takesCourse <http://www.Department0.University0.edu/GraduateCourse0> .
      |  ?X rdf:type ub:GraduateStudent }""",
    """SELECT ?X ?Y ?Z WHERE {
      |  ?Z rdf:type ub:Department . ?Z ub:subOrganizationOf ?Y .
      |  ?Y rdf:type ub:University . ?X ub:undergraduateDegreeFrom ?Y .
      |  ?X ub:memberOf ?Z . ?X rdf:type ub:GraduateStudent }""",
    """SELECT ?X WHERE {
      |  ?X ub:publicationAuthor <http://www.Department0.University0.edu/AssistantProfessor0> .
      |  ?X rdf:type ub:Publication }""",
    """SELECT ?X ?Y1 ?Y2 ?Y3 WHERE {
      |  ?X ub:worksFor <http://www.Department0.University0.edu> .
      |  ?X rdf:type ub:Professor . ?X ub:name ?Y1 .
      |  ?X ub:emailAddress ?Y2 . ?X ub:telephone ?Y3 }""",
    """SELECT ?X WHERE {
      |  ?X ub:memberOf <http://www.Department0.University0.edu> .
      |  ?X rdf:type ub:Person }""",
    """SELECT ?X WHERE { ?X rdf:type ub:Student }""",
    """SELECT ?X ?Y WHERE {
      |  <http://www.Department0.University0.edu/AssociateProfessor0> ub:teacherOf ?Y .
      |  ?Y rdf:type ub:Course . ?X ub:takesCourse ?Y . ?X rdf:type ub:Student }""",
    """SELECT ?X ?Y ?Z WHERE {
      |  ?Y ub:subOrganizationOf <http://www.University0.edu> .
      |  ?Y rdf:type ub:Department . ?X ub:memberOf ?Y .
      |  ?X rdf:type ub:Student . ?X ub:emailAddress ?Z }""",
    """SELECT ?X ?Y ?Z WHERE {
      |  ?Y rdf:type ub:Faculty . ?Y ub:teacherOf ?Z . ?X ub:advisor ?Y .
      |  ?X ub:takesCourse ?Z . ?Z rdf:type ub:Course . ?X rdf:type ub:Student }""",
    """SELECT ?X WHERE {
      |  ?X ub:takesCourse <http://www.Department0.University0.edu/GraduateCourse0> .
      |  ?X rdf:type ub:Student }""",
    """SELECT ?X WHERE {
      |  ?X ub:subOrganizationOf <http://www.University0.edu> .
      |  ?X rdf:type ub:ResearchGroup }""",
    """SELECT ?X ?Y WHERE {
      |  ?Y ub:subOrganizationOf <http://www.University0.edu> .
      |  ?Y rdf:type ub:Department . ?X ub:worksFor ?Y . ?X rdf:type ub:Chair }""",
    """SELECT ?X WHERE {
      |  <http://www.University0.edu> ub:hasAlumnus ?X . ?X rdf:type ub:Person }""",
    """SELECT ?X WHERE { ?X rdf:type ub:UndergraduateStudent }"""
  ).map(q => prologue + q.stripMargin)
}
