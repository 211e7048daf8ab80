"""Developer tooling (ref: liquid-cache dev/dev-tools Dioxus app)."""
