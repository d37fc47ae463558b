"""Sources and sinks: schema-pinned readers and layout-policy writers
(SURVEY §2.1 S1-S7, §4 file-size policy)."""
