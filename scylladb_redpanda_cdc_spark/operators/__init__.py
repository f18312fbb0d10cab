"""Operator implementations: CDC (group A), LLM-pipeline (group X) and the
shared compaction kernel. Relational/window/function operators are declared
directly in ``plans/`` — they are single Catalyst expressions and need no
imperative wrapper (SURVEY.md §4.2)."""
