"""Plan inspection utilities (pushdown / broadcast / codegen audits)."""
