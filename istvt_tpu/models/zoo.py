"""Model zoo registrations. Filled in as model families land."""
