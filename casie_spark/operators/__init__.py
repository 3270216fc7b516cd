"""Dataflow stages (operators) of the KG-construction pipeline."""
