package graft

import graft.core.Names
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check => scCheck, Parameters}
import org.scalatest.funsuite.AnyFunSuite

class NamesSpec extends AnyFunSuite {

  test("reference header normalization (preprocess_to_staging.py:13-32)") {
    assert(Names.normalizeColumnName("Date de début") == "date_de_debut")
    assert(Names.normalizeColumnName("type d'implantation") == "type_d_implantation")
    assert(Names.normalizeColumnName("Réglementaire") == "reglementaire")
    assert(Names.normalizeColumnName("unité de mesure") == "unite_de_mesure")
    assert(Names.normalizeColumnName("couverture de données") == "couverture_de_donnees")
    assert(Names.normalizeColumnName("code qualité") == "code_qualite")
    assert(Names.normalizeColumnName("validité") == "validite")
  }

  test("leading digit gets underscore prefix") {
    assert(Names.normalizeColumnName("1col") == "_1col")
    assert(Names.normalizeColumnName("2 méters") == "_2_meters")
  }

  test("full 23-column header maps to FIXTURES.md names") {
    import graft.pipeline.AirQuality
    assert(AirQuality.normalizedColumns == Seq(
      "date_de_debut", "date_de_fin", "organisme", "code_zas", "zas",
      "code_site", "nom_site", "type_d_implantation", "polluant",
      "type_d_influence", "discriminant", "reglementaire",
      "type_d_evaluation", "procedure_de_mesure", "type_de_valeur",
      "valeur", "valeur_brute", "unite_de_mesure", "taux_de_saisie",
      "couverture_temporelle", "couverture_de_donnees", "code_qualite",
      "validite"))
  }

  test("idempotent on already-normalized names (property)") {
    val prop = forAll { (s: String) =>
      val once = Names.normalizeColumnName(s)
      Names.normalizeColumnName(once) == once
    }
    assert(scCheck(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
