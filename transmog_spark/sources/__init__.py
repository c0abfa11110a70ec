"""Sources: file readers with format sniffing, plus deterministic synth tables."""
