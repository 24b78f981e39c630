"""Datalog query front-end: parse -> compile to DataFrame plan -> result
pipeline. See SURVEY.md §2.1/§2.2 for the operator inventory this package
implements and §3's lifecycle mapping."""
