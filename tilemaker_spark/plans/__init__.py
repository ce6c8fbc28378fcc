"""Declarative feature-rule plans (the reference's Lua profile tier,
rebuilt as Catalyst column expressions)."""
