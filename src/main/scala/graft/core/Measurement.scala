package graft.core

import java.sql.Timestamp

/** Typed silver row (SURVEY §1.2): the 23-column normalized schema
  * with the reference's type lattice — timestamps for the two date
  * columns, doubles for the three numeric columns (parse failure →
  * None), strings elsewhere. Field order matches
  * [[graft.pipeline.AirQuality.normalizedColumns]], so the implicit
  * product Encoder lines up with the silver DataFrame by position as
  * well as by name. */
final case class Measurement(
    date_de_debut: Option[Timestamp],
    date_de_fin: Option[Timestamp],
    organisme: Option[String],
    code_zas: Option[String],
    zas: Option[String],
    code_site: Option[String],
    nom_site: Option[String],
    type_d_implantation: Option[String],
    polluant: Option[String],
    type_d_influence: Option[String],
    discriminant: Option[String],
    reglementaire: Option[String],
    type_d_evaluation: Option[String],
    procedure_de_mesure: Option[String],
    type_de_valeur: Option[String],
    valeur: Option[Double],
    valeur_brute: Option[Double],
    unite_de_mesure: Option[String],
    taux_de_saisie: Option[Double],
    couverture_temporelle: Option[String],
    couverture_de_donnees: Option[String],
    code_qualite: Option[String],
    validite: Option[String])
