"""PostgreSQL's standard catalog column sets (public, documented in
PG's own docs; mirrored by the reference's server/pg/pg_catalog/*.h).
`FULL_COLUMNS` holds the exact SELECT * column order per relation;
`pad_catalog_views` upgrades this session's live introspection views to
the full shape by appending typed defaults for columns the engine does
not yet materialize (any/pg/system/check_columns.test pins all 144
headers)."""

from __future__ import annotations

FULL_COLUMNS: dict[str, list[str]] = {
    'pg_aggregate': [
        'aggfnoid', 'aggkind', 'aggnumdirectargs', 'aggtransfn',
        'aggfinalfn', 'aggcombinefn', 'aggserialfn', 'aggdeserialfn',
        'aggmtransfn', 'aggminvtransfn', 'aggmfinalfn', 'aggfinalextra',
        'aggmfinalextra', 'aggfinalmodify', 'aggmfinalmodify', 'aggsortop',
        'aggtranstype', 'aggtransspace', 'aggmtranstype', 'aggmtransspace',
        'agginitval', 'aggminitval',
    ],
    'pg_aios': [
        'pid', 'io_id', 'io_generation', 'state', 'operation', 'off',
        'length', 'target', 'handle_data_len', 'raw_result', 'result',
        'target_desc', 'f_sync', 'f_localmem', 'f_buffered',
    ],
    'pg_am': [
        'oid', 'amname', 'amhandler', 'amtype',
    ],
    'pg_amop': [
        'oid', 'amopfamily', 'amoplefttype', 'amoprighttype',
        'amopstrategy', 'amoppurpose', 'amopopr', 'amopmethod',
        'amopsortfamily',
    ],
    'pg_amproc': [
        'oid', 'amprocfamily', 'amproclefttype', 'amprocrighttype',
        'amprocnum', 'amproc',
    ],
    'pg_attrdef': [
        'oid', 'adrelid', 'adnum', 'adbin',
    ],
    'pg_attribute': [
        'attrelid', 'attname', 'atttypid', 'attlen', 'attnum', 'atttypmod',
        'attndims', 'attbyval', 'attalign', 'attstorage', 'attcompression',
        'attnotnull', 'atthasdef', 'atthasmissing', 'attidentity',
        'attgenerated', 'attisdropped', 'attislocal', 'attinhcount',
        'attcollation', 'attstattarget', 'attacl', 'attoptions',
        'attfdwoptions', 'attmissingval',
    ],
    'pg_auth_members': [
        'oid', 'roleid', 'member', 'grantor', 'admin_option',
        'inherit_option', 'set_option',
    ],
    'pg_authid': [
        'oid', 'rolname', 'rolsuper', 'rolinherit', 'rolcreaterole',
        'rolcreatedb', 'rolcanlogin', 'rolreplication', 'rolbypassrls',
        'rolconnlimit', 'rolpassword', 'rolvaliduntil',
    ],
    'pg_available_extension_versions': [
        'name', 'version', 'installed', 'superuser', 'trusted',
        'relocatable', 'schema', 'requires', 'comment',
    ],
    'pg_available_extensions': [
        'name', 'default_version', 'installed_version', 'comment',
    ],
    'pg_backend_memory_contexts': [
        'name', 'ident', 'type', 'level', 'path', 'total_bytes',
        'total_nblocks', 'free_bytes', 'free_chunks', 'used_bytes',
    ],
    'pg_cast': [
        'oid', 'castsource', 'casttarget', 'castfunc', 'castcontext',
        'castmethod',
    ],
    'pg_class': [
        'oid', 'relname', 'relnamespace', 'reltype', 'reloftype',
        'relowner', 'relam', 'relfilenode', 'reltablespace', 'relpages',
        'reltuples', 'relallvisible', 'relallfrozen', 'reltoastrelid',
        'relhasindex', 'relisshared', 'relpersistence', 'relkind',
        'relnatts', 'relchecks', 'relhasrules', 'relhastriggers',
        'relhassubclass', 'relrowsecurity', 'relforcerowsecurity',
        'relispopulated', 'relreplident', 'relispartition', 'relrewrite',
        'relfrozenxid', 'relminmxid', 'relacl', 'reloptions',
        'relpartbound',
    ],
    'pg_collation': [
        'oid', 'collname', 'collnamespace', 'collowner', 'collprovider',
        'collisdeterministic', 'collencoding', 'collcollate', 'collctype',
        'colllocale', 'collicurules', 'collversion',
    ],
    'pg_config': [
        'name', 'setting',
    ],
    'pg_constraint': [
        'oid', 'conname', 'connamespace', 'contype', 'condeferrable',
        'condeferred', 'conenforced', 'convalidated', 'conrelid',
        'contypid', 'conindid', 'conparentid', 'confrelid', 'confupdtype',
        'confdeltype', 'confmatchtype', 'conislocal', 'coninhcount',
        'connoinherit', 'conperiod', 'conkey', 'confkey', 'conpfeqop',
        'conppeqop', 'conffeqop', 'confdelsetcols', 'conexclop', 'conbin',
    ],
    'pg_conversion': [
        'oid', 'conname', 'connamespace', 'conowner', 'conforencoding',
        'contoencoding', 'conproc', 'condefault',
    ],
    'pg_cursors': [
        'name', 'statement', 'is_holdable', 'is_binary', 'is_scrollable',
        'creation_time',
    ],
    'pg_database': [
        'oid', 'datname', 'datdba', 'encoding', 'datlocprovider',
        'datistemplate', 'datallowconn', 'dathasloginevt', 'datconnlimit',
        'datfrozenxid', 'datminmxid', 'dattablespace', 'datcollate',
        'datctype', 'datlocale', 'daticurules', 'datcollversion', 'datacl',
    ],
    'pg_db_role_setting': [
        'setdatabase', 'setrole', 'setconfig',
    ],
    'pg_default_acl': [
        'oid', 'defaclrole', 'defaclnamespace', 'defaclobjtype',
        'defaclacl',
    ],
    'pg_depend': [
        'classid', 'objid', 'objsubid', 'refclassid', 'refobjid',
        'refobjsubid', 'deptype',
    ],
    'pg_description': [
        'objoid', 'classoid', 'objsubid', 'description',
    ],
    'pg_enum': [
        'oid', 'enumtypid', 'enumsortorder', 'enumlabel',
    ],
    'pg_event_trigger': [
        'oid', 'evtname', 'evtevent', 'evtowner', 'evtfoid', 'evtenabled',
        'evttags',
    ],
    'pg_extension': [
        'oid', 'extname', 'extowner', 'extnamespace', 'extrelocatable',
        'extversion', 'extconfig', 'extcondition',
    ],
    'pg_file_settings': [
        'sourcefile', 'sourceline', 'seqno', 'name', 'setting', 'applied',
        'error',
    ],
    'pg_foreign_data_wrapper': [
        'oid', 'fdwname', 'fdwowner', 'fdwhandler', 'fdwvalidator',
        'fdwacl', 'fdwoptions',
    ],
    'pg_foreign_server': [
        'oid', 'srvname', 'srvowner', 'srvfdw', 'srvtype', 'srvversion',
        'srvacl', 'srvoptions',
    ],
    'pg_foreign_table': [
        'ftrelid', 'ftserver', 'ftoptions',
    ],
    'pg_group': [
        'groname', 'grosysid', 'grolist',
    ],
    'pg_hba_file_rules': [
        'rule_number', 'file_name', 'line_number', 'type', 'database',
        'user_name', 'address', 'netmask', 'auth_method', 'options',
        'error',
    ],
    'pg_ident_file_mappings': [
        'map_number', 'file_name', 'line_number', 'map_name', 'sys_name',
        'pg_username', 'error',
    ],
    'pg_index': [
        'indexrelid', 'indrelid', 'indnatts', 'indnkeyatts', 'indisunique',
        'indnullsnotdistinct', 'indisprimary', 'indisexclusion',
        'indimmediate', 'indisclustered', 'indisvalid', 'indcheckxmin',
        'indisready', 'indislive', 'indisreplident', 'indkey',
        'indcollation', 'indclass', 'indoption', 'indexprs', 'indpred',
    ],
    'pg_indexes': [
        'schemaname', 'tablename', 'indexname', 'tablespace', 'indexdef',
    ],
    'pg_inherits': [
        'inhrelid', 'inhparent', 'inhseqno', 'inhdetachpending',
    ],
    'pg_init_privs': [
        'objoid', 'classoid', 'objsubid', 'privtype', 'initprivs',
    ],
    'pg_language': [
        'oid', 'lanname', 'lanowner', 'lanispl', 'lanpltrusted',
        'lanplcallfoid', 'laninline', 'lanvalidator', 'lanacl',
    ],
    'pg_largeobject': [
        'loid', 'pageno', 'data',
    ],
    'pg_largeobject_metadata': [
        'oid', 'lomowner', 'lomacl',
    ],
    'pg_locks': [
        'locktype', 'database', 'relation', 'page', 'tuple', 'virtualxid',
        'transactionid', 'classid', 'objid', 'objsubid',
        'virtualtransaction', 'pid', 'mode', 'granted', 'fastpath',
        'waitstart',
    ],
    'pg_matviews': [
        'schemaname', 'matviewname', 'matviewowner', 'tablespace',
        'hasindexes', 'ispopulated', 'definition',
    ],
    'pg_namespace': [
        'oid', 'nspname', 'nspowner', 'nspacl',
    ],
    'pg_opclass': [
        'oid', 'opcmethod', 'opcname', 'opcnamespace', 'opcowner',
        'opcfamily', 'opcintype', 'opcdefault', 'opckeytype',
    ],
    'pg_operator': [
        'oid', 'oprname', 'oprnamespace', 'oprowner', 'oprkind',
        'oprcanmerge', 'oprcanhash', 'oprleft', 'oprright', 'oprresult',
        'oprcom', 'oprnegate', 'oprcode', 'oprrest', 'oprjoin',
    ],
    'pg_opfamily': [
        'oid', 'opfmethod', 'opfname', 'opfnamespace', 'opfowner',
    ],
    'pg_parameter_acl': [
        'oid', 'parname', 'paracl',
    ],
    'pg_partitioned_table': [
        'partrelid', 'partstrat', 'partnatts', 'partdefid', 'partattrs',
        'partclass', 'partcollation', 'partexprs',
    ],
    'pg_policies': [
        'schemaname', 'tablename', 'policyname', 'permissive', 'roles',
        'cmd', 'qual', 'with_check',
    ],
    'pg_policy': [
        'oid', 'polname', 'polrelid', 'polcmd', 'polpermissive',
        'polroles', 'polqual', 'polwithcheck',
    ],
    'pg_prepared_statements': [
        'name', 'statement', 'prepare_time', 'parameter_types',
        'result_types', 'from_sql', 'generic_plans', 'custom_plans',
    ],
    'pg_prepared_xacts': [
        'transaction', 'gid', 'prepared', 'owner', 'database',
    ],
    'pg_proc': [
        'oid', 'proname', 'pronamespace', 'proowner', 'prolang', 'procost',
        'prorows', 'provariadic', 'prosupport', 'prokind', 'prosecdef',
        'proleakproof', 'proisstrict', 'proretset', 'provolatile',
        'proparallel', 'pronargs', 'pronargdefaults', 'prorettype',
        'proargtypes', 'proallargtypes', 'proargmodes', 'proargnames',
        'proargdefaults', 'protrftypes', 'prosrc', 'probin', 'prosqlbody',
        'proconfig', 'proacl',
    ],
    'pg_publication': [
        'oid', 'pubname', 'pubowner', 'puballtables', 'pubinsert',
        'pubupdate', 'pubdelete', 'pubtruncate', 'pubviaroot',
        'pubgencols',
    ],
    'pg_publication_namespace': [
        'oid', 'pnpubid', 'pnnspid',
    ],
    'pg_publication_rel': [
        'oid', 'prpubid', 'prrelid', 'prqual', 'prattrs',
    ],
    'pg_publication_tables': [
        'pubname', 'schemaname', 'tablename', 'attnames', 'rowfilter',
    ],
    'pg_range': [
        'rngtypid', 'rngsubtype', 'rngmultitypid', 'rngcollation',
        'rngsubopc', 'rngcanonical', 'rngsubdiff',
    ],
    'pg_replication_origin': [
        'roident', 'roname',
    ],
    'pg_replication_origin_status': [
        'local_id', 'external_id', 'remote_lsn', 'local_lsn',
    ],
    'pg_replication_slots': [
        'slot_name', 'plugin', 'slot_type', 'datoid', 'database',
        'temporary', 'active', 'active_pid', 'xmin', 'catalog_xmin',
        'restart_lsn', 'confirmed_flush_lsn', 'wal_status',
        'safe_wal_size', 'two_phase', 'two_phase_at', 'inactive_since',
        'conflicting', 'invalidation_reason', 'failover', 'synced',
    ],
    'pg_rewrite': [
        'oid', 'rulename', 'ev_class', 'ev_type', 'ev_enabled',
        'is_instead', 'ev_qual', 'ev_action',
    ],
    'pg_roles': [
        'rolname', 'rolsuper', 'rolinherit', 'rolcreaterole',
        'rolcreatedb', 'rolcanlogin', 'rolreplication', 'rolconnlimit',
        'rolpassword', 'rolvaliduntil', 'rolbypassrls', 'rolconfig', 'oid',
    ],
    'pg_rules': [
        'schemaname', 'tablename', 'rulename', 'definition',
    ],
    'pg_seclabel': [
        'objoid', 'classoid', 'objsubid', 'provider', 'label',
    ],
    'pg_seclabels': [
        'objoid', 'classoid', 'objsubid', 'objtype', 'objnamespace',
        'objname', 'provider', 'label',
    ],
    'pg_sequence': [
        'seqrelid', 'seqtypid', 'seqstart', 'seqincrement', 'seqmax',
        'seqmin', 'seqcache', 'seqcycle',
    ],
    'pg_sequences': [
        'schemaname', 'sequencename', 'sequenceowner', 'data_type',
        'start_value', 'min_value', 'max_value', 'increment_by', 'cycle',
        'cache_size', 'last_value',
    ],
    'pg_settings': [
        'name', 'setting', 'unit', 'category', 'short_desc', 'extra_desc',
        'context', 'vartype', 'source', 'min_val', 'max_val', 'enumvals',
        'boot_val', 'reset_val', 'sourcefile', 'sourceline',
        'pending_restart',
    ],
    'pg_shadow': [
        'usename', 'usesysid', 'usecreatedb', 'usesuper', 'userepl',
        'usebypassrls', 'passwd', 'valuntil', 'useconfig',
    ],
    'pg_shdepend': [
        'dbid', 'classid', 'objid', 'objsubid', 'refclassid', 'refobjid',
        'deptype',
    ],
    'pg_shdescription': [
        'objoid', 'classoid', 'description',
    ],
    'pg_shmem_allocations': [
        'name', 'off', 'size', 'allocated_size',
    ],
    'pg_shmem_allocations_numa': [
        'name', 'numa_node', 'size',
    ],
    'pg_shseclabel': [
        'objoid', 'classoid', 'provider', 'label',
    ],
    'pg_stat_activity': [
        'datid', 'datname', 'pid', 'leader_pid', 'usesysid', 'usename',
        'application_name', 'client_addr', 'client_hostname',
        'client_port', 'backend_start', 'xact_start', 'query_start',
        'state_change', 'wait_event_type', 'wait_event', 'state',
        'backend_xid', 'backend_xmin', 'query_id', 'query', 'backend_type',
    ],
    'pg_stat_all_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_scan', 'last_idx_scan', 'idx_tup_read', 'idx_tup_fetch',
    ],
    'pg_stat_all_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'last_seq_scan',
        'seq_tup_read', 'idx_scan', 'last_idx_scan', 'idx_tup_fetch',
        'n_tup_ins', 'n_tup_upd', 'n_tup_del', 'n_tup_hot_upd',
        'n_tup_newpage_upd', 'n_live_tup', 'n_dead_tup',
        'n_mod_since_analyze', 'n_ins_since_vacuum', 'last_vacuum',
        'last_autovacuum', 'last_analyze', 'last_autoanalyze',
        'vacuum_count', 'autovacuum_count', 'analyze_count',
        'autoanalyze_count', 'total_vacuum_time', 'total_autovacuum_time',
        'total_analyze_time', 'total_autoanalyze_time',
    ],
    'pg_stat_archiver': [
        'archived_count', 'last_archived_wal', 'last_archived_time',
        'failed_count', 'last_failed_wal', 'last_failed_time',
        'stats_reset',
    ],
    'pg_stat_bgwriter': [
        'buffers_clean', 'maxwritten_clean', 'buffers_alloc',
        'stats_reset',
    ],
    'pg_stat_checkpointer': [
        'num_timed', 'num_requested', 'num_done', 'restartpoints_timed',
        'restartpoints_req', 'restartpoints_done', 'write_time',
        'sync_time', 'buffers_written', 'slru_written', 'stats_reset',
    ],
    'pg_stat_database': [
        'datid', 'datname', 'numbackends', 'xact_commit', 'xact_rollback',
        'blks_read', 'blks_hit', 'tup_returned', 'tup_fetched',
        'tup_inserted', 'tup_updated', 'tup_deleted', 'conflicts',
        'temp_files', 'temp_bytes', 'deadlocks', 'checksum_failures',
        'checksum_last_failure', 'blk_read_time', 'blk_write_time',
        'session_time', 'active_time', 'idle_in_transaction_time',
        'sessions', 'sessions_abandoned', 'sessions_fatal',
        'sessions_killed', 'parallel_workers_to_launch',
        'parallel_workers_launched', 'stats_reset',
    ],
    'pg_stat_database_conflicts': [
        'datid', 'datname', 'confl_tablespace', 'confl_lock',
        'confl_snapshot', 'confl_bufferpin', 'confl_deadlock',
        'confl_active_logicalslot',
    ],
    'pg_stat_gssapi': [
        'pid', 'gss_authenticated', 'principal', 'encrypted',
        'credentials_delegated',
    ],
    'pg_stat_io': [
        'backend_type', 'object', 'context', 'reads', 'read_bytes',
        'read_time', 'writes', 'write_bytes', 'write_time', 'writebacks',
        'writeback_time', 'extends', 'extend_bytes', 'extend_time', 'hits',
        'evictions', 'reuses', 'fsyncs', 'fsync_time', 'stats_reset',
    ],
    'pg_stat_progress_analyze': [
        'pid', 'datid', 'datname', 'relid', 'phase', 'sample_blks_total',
        'sample_blks_scanned', 'ext_stats_total', 'ext_stats_computed',
        'child_tables_total', 'child_tables_done',
        'current_child_table_relid', 'delay_time',
    ],
    'pg_stat_progress_basebackup': [
        'pid', 'phase', 'backup_total', 'backup_streamed',
        'tablespaces_total', 'tablespaces_streamed',
    ],
    'pg_stat_progress_cluster': [
        'pid', 'datid', 'datname', 'relid', 'command', 'phase',
        'cluster_index_relid', 'heap_tuples_scanned',
        'heap_tuples_written', 'heap_blks_total', 'heap_blks_scanned',
        'index_rebuild_count',
    ],
    'pg_stat_progress_copy': [
        'pid', 'datid', 'datname', 'relid', 'command', 'type',
        'bytes_processed', 'bytes_total', 'tuples_processed',
        'tuples_excluded', 'tuples_skipped',
    ],
    'pg_stat_progress_create_index': [
        'pid', 'datid', 'datname', 'relid', 'index_relid', 'command',
        'phase', 'lockers_total', 'lockers_done', 'current_locker_pid',
        'blocks_total', 'blocks_done', 'tuples_total', 'tuples_done',
        'partitions_total', 'partitions_done',
    ],
    'pg_stat_progress_vacuum': [
        'pid', 'datid', 'datname', 'relid', 'phase', 'heap_blks_total',
        'heap_blks_scanned', 'heap_blks_vacuumed', 'index_vacuum_count',
        'max_dead_tuple_bytes', 'dead_tuple_bytes', 'num_dead_item_ids',
        'indexes_total', 'indexes_processed', 'delay_time',
    ],
    'pg_stat_recovery_prefetch': [
        'stats_reset', 'prefetch', 'hit', 'skip_init', 'skip_new',
        'skip_fpw', 'skip_rep', 'wal_distance', 'block_distance',
        'io_depth',
    ],
    'pg_stat_replication': [
        'pid', 'usesysid', 'usename', 'application_name', 'client_addr',
        'client_hostname', 'client_port', 'backend_start', 'backend_xmin',
        'state', 'sent_lsn', 'write_lsn', 'flush_lsn', 'replay_lsn',
        'write_lag', 'flush_lag', 'replay_lag', 'sync_priority',
        'sync_state', 'reply_time',
    ],
    'pg_stat_replication_slots': [
        'slot_name', 'spill_txns', 'spill_count', 'spill_bytes',
        'stream_txns', 'stream_count', 'stream_bytes', 'total_txns',
        'total_bytes', 'stats_reset',
    ],
    'pg_stat_slru': [
        'name', 'blks_zeroed', 'blks_hit', 'blks_read', 'blks_written',
        'blks_exists', 'flushes', 'truncates', 'stats_reset',
    ],
    'pg_stat_ssl': [
        'pid', 'ssl', 'version', 'cipher', 'bits', 'client_dn',
        'client_serial', 'issuer_dn',
    ],
    'pg_stat_subscription': [
        'subid', 'subname', 'worker_type', 'pid', 'leader_pid', 'relid',
        'received_lsn', 'last_msg_send_time', 'last_msg_receipt_time',
        'latest_end_lsn', 'latest_end_time',
    ],
    'pg_stat_subscription_stats': [
        'subid', 'subname', 'apply_error_count', 'sync_error_count',
        'confl_insert_exists', 'confl_update_origin_differs',
        'confl_update_exists', 'confl_update_missing',
        'confl_delete_origin_differs', 'confl_delete_missing',
        'confl_multiple_unique_conflicts', 'stats_reset',
    ],
    'pg_stat_sys_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_scan', 'last_idx_scan', 'idx_tup_read', 'idx_tup_fetch',
    ],
    'pg_stat_sys_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'last_seq_scan',
        'seq_tup_read', 'idx_scan', 'last_idx_scan', 'idx_tup_fetch',
        'n_tup_ins', 'n_tup_upd', 'n_tup_del', 'n_tup_hot_upd',
        'n_tup_newpage_upd', 'n_live_tup', 'n_dead_tup',
        'n_mod_since_analyze', 'n_ins_since_vacuum', 'last_vacuum',
        'last_autovacuum', 'last_analyze', 'last_autoanalyze',
        'vacuum_count', 'autovacuum_count', 'analyze_count',
        'autoanalyze_count', 'total_vacuum_time', 'total_autovacuum_time',
        'total_analyze_time', 'total_autoanalyze_time',
    ],
    'pg_stat_user_functions': [
        'funcid', 'schemaname', 'funcname', 'calls', 'total_time',
        'self_time',
    ],
    'pg_stat_user_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_scan', 'last_idx_scan', 'idx_tup_read', 'idx_tup_fetch',
    ],
    'pg_stat_user_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'last_seq_scan',
        'seq_tup_read', 'idx_scan', 'last_idx_scan', 'idx_tup_fetch',
        'n_tup_ins', 'n_tup_upd', 'n_tup_del', 'n_tup_hot_upd',
        'n_tup_newpage_upd', 'n_live_tup', 'n_dead_tup',
        'n_mod_since_analyze', 'n_ins_since_vacuum', 'last_vacuum',
        'last_autovacuum', 'last_analyze', 'last_autoanalyze',
        'vacuum_count', 'autovacuum_count', 'analyze_count',
        'autoanalyze_count', 'total_vacuum_time', 'total_autovacuum_time',
        'total_analyze_time', 'total_autoanalyze_time',
    ],
    'pg_stat_wal': [
        'wal_records', 'wal_fpi', 'wal_bytes', 'wal_buffers_full',
        'stats_reset',
    ],
    'pg_stat_wal_receiver': [
        'pid', 'status', 'receive_start_lsn', 'receive_start_tli',
        'written_lsn', 'flushed_lsn', 'received_tli', 'last_msg_send_time',
        'last_msg_receipt_time', 'latest_end_lsn', 'latest_end_time',
        'slot_name', 'sender_host', 'sender_port', 'conninfo',
    ],
    'pg_stat_xact_all_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'seq_tup_read',
        'idx_scan', 'idx_tup_fetch', 'n_tup_ins', 'n_tup_upd', 'n_tup_del',
        'n_tup_hot_upd', 'n_tup_newpage_upd',
    ],
    'pg_stat_xact_sys_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'seq_tup_read',
        'idx_scan', 'idx_tup_fetch', 'n_tup_ins', 'n_tup_upd', 'n_tup_del',
        'n_tup_hot_upd', 'n_tup_newpage_upd',
    ],
    'pg_stat_xact_user_functions': [
        'funcid', 'schemaname', 'funcname', 'calls', 'total_time',
        'self_time',
    ],
    'pg_stat_xact_user_tables': [
        'relid', 'schemaname', 'relname', 'seq_scan', 'seq_tup_read',
        'idx_scan', 'idx_tup_fetch', 'n_tup_ins', 'n_tup_upd', 'n_tup_del',
        'n_tup_hot_upd', 'n_tup_newpage_upd',
    ],
    'pg_statio_all_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_blks_read', 'idx_blks_hit',
    ],
    'pg_statio_all_sequences': [
        'relid', 'schemaname', 'relname', 'blks_read', 'blks_hit',
    ],
    'pg_statio_all_tables': [
        'relid', 'schemaname', 'relname', 'heap_blks_read',
        'heap_blks_hit', 'idx_blks_read', 'idx_blks_hit',
        'toast_blks_read', 'toast_blks_hit', 'tidx_blks_read',
        'tidx_blks_hit',
    ],
    'pg_statio_sys_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_blks_read', 'idx_blks_hit',
    ],
    'pg_statio_sys_sequences': [
        'relid', 'schemaname', 'relname', 'blks_read', 'blks_hit',
    ],
    'pg_statio_sys_tables': [
        'relid', 'schemaname', 'relname', 'heap_blks_read',
        'heap_blks_hit', 'idx_blks_read', 'idx_blks_hit',
        'toast_blks_read', 'toast_blks_hit', 'tidx_blks_read',
        'tidx_blks_hit',
    ],
    'pg_statio_user_indexes': [
        'relid', 'indexrelid', 'schemaname', 'relname', 'indexrelname',
        'idx_blks_read', 'idx_blks_hit',
    ],
    'pg_statio_user_sequences': [
        'relid', 'schemaname', 'relname', 'blks_read', 'blks_hit',
    ],
    'pg_statio_user_tables': [
        'relid', 'schemaname', 'relname', 'heap_blks_read',
        'heap_blks_hit', 'idx_blks_read', 'idx_blks_hit',
        'toast_blks_read', 'toast_blks_hit', 'tidx_blks_read',
        'tidx_blks_hit',
    ],
    'pg_statistic': [
        'starelid', 'staattnum', 'stainherit', 'stanullfrac', 'stawidth',
        'stadistinct', 'stakind1', 'stakind2', 'stakind3', 'stakind4',
        'stakind5', 'staop1', 'staop2', 'staop3', 'staop4', 'staop5',
        'stacoll1', 'stacoll2', 'stacoll3', 'stacoll4', 'stacoll5',
        'stanumbers1', 'stanumbers2', 'stanumbers3', 'stanumbers4',
        'stanumbers5', 'stavalues1', 'stavalues2', 'stavalues3',
        'stavalues4', 'stavalues5',
    ],
    'pg_statistic_ext': [
        'oid', 'stxrelid', 'stxname', 'stxnamespace', 'stxowner',
        'stxkeys', 'stxstattarget', 'stxkind', 'stxexprs',
    ],
    'pg_statistic_ext_data': [
        'stxoid', 'stxdinherit', 'stxdndistinct', 'stxddependencies',
        'stxdmcv', 'stxdexpr',
    ],
    'pg_stats': [
        'schemaname', 'tablename', 'attname', 'inherited', 'null_frac',
        'avg_width', 'n_distinct', 'most_common_vals', 'most_common_freqs',
        'histogram_bounds', 'correlation', 'most_common_elems',
        'most_common_elem_freqs', 'elem_count_histogram',
        'range_length_histogram', 'range_empty_frac',
        'range_bounds_histogram',
    ],
    'pg_stats_ext': [
        'schemaname', 'tablename', 'statistics_schemaname',
        'statistics_name', 'statistics_owner', 'attnames', 'exprs',
        'kinds', 'inherited', 'n_distinct', 'dependencies',
        'most_common_vals', 'most_common_val_nulls', 'most_common_freqs',
        'most_common_base_freqs',
    ],
    'pg_stats_ext_exprs': [
        'schemaname', 'tablename', 'statistics_schemaname',
        'statistics_name', 'statistics_owner', 'expr', 'inherited',
        'null_frac', 'avg_width', 'n_distinct', 'most_common_vals',
        'most_common_freqs', 'histogram_bounds', 'correlation',
        'most_common_elems', 'most_common_elem_freqs',
        'elem_count_histogram',
    ],
    'pg_subscription': [
        'oid', 'subdbid', 'subskiplsn', 'subname', 'subowner',
        'subenabled', 'subbinary', 'substream', 'subtwophasestate',
        'subdisableonerr', 'subpasswordrequired', 'subrunasowner',
        'subfailover', 'subconninfo', 'subslotname', 'subsynccommit',
        'subpublications', 'suborigin',
    ],
    'pg_subscription_rel': [
        'srsubid', 'srrelid', 'srsubstate', 'srsublsn',
    ],
    'pg_tables': [
        'schemaname', 'tablename', 'tableowner', 'tablespace',
        'hasindexes', 'hasrules', 'hastriggers', 'rowsecurity',
    ],
    'pg_tablespace': [
        'oid', 'spcname', 'spcowner', 'spcacl', 'spcoptions',
    ],
    'pg_timezone_abbrevs': [
        'abbrev', 'utc_offset', 'is_dst',
    ],
    'pg_timezone_names': [
        'name', 'abbrev', 'utc_offset', 'is_dst',
    ],
    'pg_transform': [
        'oid', 'trftype', 'trflang', 'trffromsql', 'trftosql',
    ],
    'pg_trigger': [
        'oid', 'tgrelid', 'tgparentid', 'tgname', 'tgfoid', 'tgtype',
        'tgenabled', 'tgisinternal', 'tgconstrrelid', 'tgconstrindid',
        'tgconstraint', 'tgdeferrable', 'tginitdeferred', 'tgnargs',
        'tgattr', 'tgargs', 'tgqual', 'tgoldtable', 'tgnewtable',
    ],
    'pg_ts_config': [
        'oid', 'cfgname', 'cfgnamespace', 'cfgowner', 'cfgparser',
    ],
    'pg_ts_config_map': [
        'mapcfg', 'maptokentype', 'mapseqno', 'mapdict',
    ],
    'pg_ts_dict': [
        'oid', 'dictname', 'dictnamespace', 'dictowner', 'dicttemplate',
        'dictinitoption',
    ],
    'pg_ts_parser': [
        'oid', 'prsname', 'prsnamespace', 'prsstart', 'prstoken', 'prsend',
        'prsheadline', 'prslextype',
    ],
    'pg_ts_template': [
        'oid', 'tmplname', 'tmplnamespace', 'tmplinit', 'tmpllexize',
    ],
    'pg_type': [
        'oid', 'typname', 'typnamespace', 'typowner', 'typlen', 'typbyval',
        'typtype', 'typcategory', 'typispreferred', 'typisdefined',
        'typdelim', 'typrelid', 'typsubscript', 'typelem', 'typarray',
        'typinput', 'typoutput', 'typreceive', 'typsend', 'typmodin',
        'typmodout', 'typanalyze', 'typalign', 'typstorage', 'typnotnull',
        'typbasetype', 'typtypmod', 'typndims', 'typcollation',
        'typdefaultbin', 'typdefault', 'typacl',
    ],
    'pg_user': [
        'usename', 'usesysid', 'usecreatedb', 'usesuper', 'userepl',
        'usebypassrls', 'passwd', 'valuntil', 'useconfig',
    ],
    'pg_user_mapping': [
        'oid', 'umuser', 'umserver', 'umoptions',
    ],
    'pg_user_mappings': [
        'umid', 'srvid', 'srvname', 'umuser', 'usename', 'umoptions',
    ],
    'pg_views': [
        'schemaname', 'viewname', 'viewowner', 'definition',
    ],
    'pg_wait_events': [
        'type', 'name', 'description',
    ],
}

#: padded columns that value-level tests actually read get real typed
#: defaults; everything else pads as CAST(NULL AS STRING)
PAD_OVERRIDES: dict[str, dict[str, tuple[str, str]]] = {
    "pg_database": {
        "datistemplate": ("boolean", "false"),
        "datallowconn": ("boolean", "true"),
        "dathasloginevt": ("boolean", "false"),
        "datconnlimit": ("int", "-1"),
        "datlocprovider": ("string", "'c'"),
        "datcollate": ("string", "'C.UTF-8'"),
        "datctype": ("string", "'C.UTF-8'"),
        "datfrozenxid": ("int", "0"),
        "datminmxid": ("int", "0"),
        "dattablespace": ("int", "1663"),
    },
    "pg_attribute": {
        "attgenerated": ("string", "''"),
        "attidentity": ("string", "''"),
        "attisdropped": ("boolean", "false"),
        "attislocal": ("boolean", "true"),
        "attnotnull": ("boolean", "false"),
        "atthasdef": ("boolean", "false"),
        "atthasmissing": ("boolean", "false"),
        "attbyval": ("boolean", "true"),
        "attndims": ("int", "0"),
        "attinhcount": ("int", "0"),
        "attcollation": ("int", "0"),
        "attstattarget": ("int", "-1"),
        "attstorage": ("string", "'p'"),
        "attalign": ("string", "'i'"),
        "attcompression": ("string", "''"),
    },
    "pg_class": {
        "relpages": ("int", "0"),
        "reltuples": ("float", "-1.0"),
        "relallvisible": ("int", "0"),
        "relallfrozen": ("int", "0"),
        "reltoastrelid": ("int", "0"),
        "relhasindex": ("boolean", "false"),
        "relisshared": ("boolean", "false"),
        "relpersistence": ("string", "'p'"),
        "relnatts": ("int", "0"),
        "relchecks": ("int", "0"),
        "relhasrules": ("boolean", "false"),
        "relhastriggers": ("boolean", "false"),
        "relhassubclass": ("boolean", "false"),
        "relrowsecurity": ("boolean", "false"),
        "relforcerowsecurity": ("boolean", "false"),
        "relispopulated": ("boolean", "true"),
        "relreplident": ("string", "'d'"),
        "relispartition": ("boolean", "false"),
        "relrewrite": ("int", "0"),
        "relfrozenxid": ("int", "0"),
        "relminmxid": ("int", "0"),
        "relam": ("int", "2"),
        "relfilenode": ("int", "0"),
        "reltablespace": ("int", "0"),
        "reltype": ("int", "0"),
        "reloftype": ("int", "0"),
    },
    "pg_roles": {
        "rolinherit": ("boolean", "true"),
        "rolcreaterole": ("boolean", "false"),
        "rolcreatedb": ("boolean", "false"),
        "rolcanlogin": ("boolean", "true"),
        "rolreplication": ("boolean", "false"),
        "rolbypassrls": ("boolean", "false"),
        "rolconnlimit": ("int", "-1"),
    },
    "pg_authid": {
        "rolinherit": ("boolean", "true"),
        "rolcreaterole": ("boolean", "false"),
        "rolcreatedb": ("boolean", "false"),
        "rolreplication": ("boolean", "false"),
        "rolbypassrls": ("boolean", "false"),
        "rolconnlimit": ("int", "-1"),
    },
    "pg_settings": {
        "short_desc": ("string", "''"),
        "extra_desc": ("string", "''"),
        "context": ("string", "'user'"),
        "vartype": ("string", "'string'"),
        "source": ("string", "'default'"),
        "boot_val": ("string", "''"),
        "reset_val": ("string", "''"),
        "pending_restart": ("boolean", "false"),
    },
    "pg_proc": {
        "pronamespace": ("int", "11"),
        "proowner": ("int", "1000000"),
        "prolang": ("int", "14"),
        "prokind": ("string", "'f'"),
        "prosecdef": ("boolean", "false"),
        "proleakproof": ("boolean", "false"),
        "proisstrict": ("boolean", "false"),
        "provolatile": ("string", "'i'"),
        "proparallel": ("string", "'s'"),
        "pronargdefaults": ("int", "0"),
        "prorettype": ("int", "25"),
    },
    "pg_namespace": {
        "nspowner": ("int", "1000000"),
    },
    "information_schema_table_constraints": {
        "enforced": ("string", "'YES'"),
        "is_deferrable": ("string", "'NO'"),
        "initially_deferred": ("string", "'NO'"),
        "constraint_schema": ("string", "'public'"),
        "constraint_catalog": ("string", "'serene'"),
        "table_catalog": ("string", "'serene'"),
    },
    "information_schema_routines": {
        "routine_type": ("string", "'FUNCTION'"),
        "external_language": ("string", "'SQL'"),
    },
    "information_schema_tables": {
        "is_insertable_into": ("string", "'YES'"),
        "is_typed": ("string", "'NO'"),
    },
    "pg_constraint": {
        "convalidated": ("boolean", "true"),
        "condeferrable": ("boolean", "false"),
        "condeferred": ("boolean", "false"),
        "conenforced": ("boolean", "true"),
        "conislocal": ("boolean", "true"),
        "coninhcount": ("int", "0"),
        "connoinherit": ("boolean", "true"),
        "connamespace": ("int", "2200"),
    },
    "pg_index": {
        "indisunique": ("boolean", "false"),
        "indisprimary": ("boolean", "false"),
        "indisvalid": ("boolean", "true"),
        "indisready": ("boolean", "true"),
        "indislive": ("boolean", "true"),
    },
}




#: information_schema relations (same instrument, prefixed views)
IS_FULL_COLUMNS: dict[str, list[str]] = {
    'information_schema__pg_foreign_data_wrappers': [
        'oid', 'fdwowner', 'fdwoptions', 'foreign_data_wrapper_catalog',
        'foreign_data_wrapper_name', 'authorization_identifier',
        'foreign_data_wrapper_language',
    ],
    'information_schema__pg_foreign_servers': [
        'oid', 'srvoptions', 'foreign_server_catalog',
        'foreign_server_name', 'foreign_data_wrapper_catalog',
        'foreign_data_wrapper_name', 'foreign_server_type',
        'foreign_server_version', 'authorization_identifier',
    ],
    'information_schema__pg_foreign_table_columns': [
        'nspname', 'relname', 'attname', 'attfdwoptions',
    ],
    'information_schema__pg_foreign_tables': [
        'foreign_table_catalog', 'foreign_table_schema',
        'foreign_table_name', 'ftoptions', 'foreign_server_catalog',
        'foreign_server_name', 'authorization_identifier',
    ],
    'information_schema__pg_user_mappings': [
        'oid', 'umoptions', 'umuser', 'authorization_identifier',
        'foreign_server_catalog', 'foreign_server_name', 'srvowner',
    ],
    'information_schema_administrable_role_authorizations': [
        'grantee', 'role_name', 'is_grantable',
    ],
    'information_schema_applicable_roles': [
        'grantee', 'role_name', 'is_grantable',
    ],
    'information_schema_attributes': [
        'udt_catalog', 'udt_schema', 'udt_name', 'attribute_name',
        'ordinal_position', 'attribute_default', 'is_nullable',
        'data_type', 'character_maximum_length', 'character_octet_length',
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'collation_catalog', 'collation_schema',
        'collation_name', 'numeric_precision', 'numeric_precision_radix',
        'numeric_scale', 'datetime_precision', 'interval_type',
        'interval_precision', 'attribute_udt_catalog',
        'attribute_udt_schema', 'attribute_udt_name', 'scope_catalog',
        'scope_schema', 'scope_name', 'maximum_cardinality',
        'dtd_identifier', 'is_derived_reference_attribute',
    ],
    'information_schema_character_sets': [
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'character_repertoire', 'form_of_use',
        'default_collate_catalog', 'default_collate_schema',
        'default_collate_name',
    ],
    'information_schema_check_constraint_routine_usage': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'specific_catalog', 'specific_schema', 'specific_name',
    ],
    'information_schema_check_constraints': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'check_clause',
    ],
    'information_schema_collation_character_set_applicability': [
        'collation_catalog', 'collation_schema', 'collation_name',
        'character_set_catalog', 'character_set_schema',
        'character_set_name',
    ],
    'information_schema_collations': [
        'collation_catalog', 'collation_schema', 'collation_name',
        'pad_attribute',
    ],
    'information_schema_column_column_usage': [
        'table_catalog', 'table_schema', 'table_name', 'column_name',
        'dependent_column',
    ],
    'information_schema_column_domain_usage': [
        'domain_catalog', 'domain_schema', 'domain_name', 'table_catalog',
        'table_schema', 'table_name', 'column_name',
    ],
    'information_schema_column_options': [
        'table_catalog', 'table_schema', 'table_name', 'column_name',
        'option_name', 'option_value',
    ],
    'information_schema_column_privileges': [
        'grantor', 'grantee', 'table_catalog', 'table_schema',
        'table_name', 'column_name', 'privilege_type', 'is_grantable',
    ],
    'information_schema_column_udt_usage': [
        'udt_catalog', 'udt_schema', 'udt_name', 'table_catalog',
        'table_schema', 'table_name', 'column_name',
    ],
    'information_schema_columns': [
        'table_catalog', 'table_schema', 'table_name', 'column_name',
        'ordinal_position', 'column_default', 'is_nullable', 'data_type',
        'character_maximum_length', 'character_octet_length',
        'numeric_precision', 'numeric_precision_radix', 'numeric_scale',
        'datetime_precision', 'interval_type', 'interval_precision',
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'collation_catalog', 'collation_schema',
        'collation_name', 'domain_catalog', 'domain_schema', 'domain_name',
        'udt_catalog', 'udt_schema', 'udt_name', 'scope_catalog',
        'scope_schema', 'scope_name', 'maximum_cardinality',
        'dtd_identifier', 'is_self_referencing', 'is_identity',
        'identity_generation', 'identity_start', 'identity_increment',
        'identity_maximum', 'identity_minimum', 'identity_cycle',
        'is_generated', 'generation_expression', 'is_updatable',
    ],
    'information_schema_constraint_column_usage': [
        'table_catalog', 'table_schema', 'table_name', 'column_name',
        'constraint_catalog', 'constraint_schema', 'constraint_name',
    ],
    'information_schema_constraint_table_usage': [
        'table_catalog', 'table_schema', 'table_name',
        'constraint_catalog', 'constraint_schema', 'constraint_name',
    ],
    'information_schema_data_type_privileges': [
        'object_catalog', 'object_schema', 'object_name', 'object_type',
        'dtd_identifier',
    ],
    'information_schema_domain_constraints': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'domain_catalog', 'domain_schema', 'domain_name', 'is_deferrable',
        'initially_deferred',
    ],
    'information_schema_domain_udt_usage': [
        'udt_catalog', 'udt_schema', 'udt_name', 'domain_catalog',
        'domain_schema', 'domain_name',
    ],
    'information_schema_domains': [
        'domain_catalog', 'domain_schema', 'domain_name', 'data_type',
        'character_maximum_length', 'character_octet_length',
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'collation_catalog', 'collation_schema',
        'collation_name', 'numeric_precision', 'numeric_precision_radix',
        'numeric_scale', 'datetime_precision', 'interval_type',
        'interval_precision', 'domain_default', 'udt_catalog',
        'udt_schema', 'udt_name', 'scope_catalog', 'scope_schema',
        'scope_name', 'maximum_cardinality', 'dtd_identifier',
    ],
    'information_schema_element_types': [
        'object_catalog', 'object_schema', 'object_name', 'object_type',
        'collection_type_identifier', 'data_type',
        'character_maximum_length', 'character_octet_length',
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'collation_catalog', 'collation_schema',
        'collation_name', 'numeric_precision', 'numeric_precision_radix',
        'numeric_scale', 'datetime_precision', 'interval_type',
        'interval_precision', 'udt_catalog', 'udt_schema', 'udt_name',
        'scope_catalog', 'scope_schema', 'scope_name',
        'maximum_cardinality', 'dtd_identifier',
    ],
    'information_schema_enabled_roles': [
        'role_name',
    ],
    'information_schema_foreign_data_wrapper_options': [
        'foreign_data_wrapper_catalog', 'foreign_data_wrapper_name',
        'option_name', 'option_value',
    ],
    'information_schema_foreign_data_wrappers': [
        'foreign_data_wrapper_catalog', 'foreign_data_wrapper_name',
        'authorization_identifier', 'library_name',
        'foreign_data_wrapper_language',
    ],
    'information_schema_foreign_server_options': [
        'foreign_server_catalog', 'foreign_server_name', 'option_name',
        'option_value',
    ],
    'information_schema_foreign_servers': [
        'foreign_server_catalog', 'foreign_server_name',
        'foreign_data_wrapper_catalog', 'foreign_data_wrapper_name',
        'foreign_server_type', 'foreign_server_version',
        'authorization_identifier',
    ],
    'information_schema_foreign_table_options': [
        'foreign_table_catalog', 'foreign_table_schema',
        'foreign_table_name', 'option_name', 'option_value',
    ],
    'information_schema_foreign_tables': [
        'foreign_table_catalog', 'foreign_table_schema',
        'foreign_table_name', 'foreign_server_catalog',
        'foreign_server_name',
    ],
    'information_schema_information_schema_catalog_name': [
        'catalog_name',
    ],
    'information_schema_key_column_usage': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'table_catalog', 'table_schema', 'table_name', 'column_name',
        'ordinal_position', 'position_in_unique_constraint',
    ],
    'information_schema_parameters': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'ordinal_position', 'parameter_mode', 'is_result', 'as_locator',
        'parameter_name', 'data_type', 'character_maximum_length',
        'character_octet_length', 'character_set_catalog',
        'character_set_schema', 'character_set_name', 'collation_catalog',
        'collation_schema', 'collation_name', 'numeric_precision',
        'numeric_precision_radix', 'numeric_scale', 'datetime_precision',
        'interval_type', 'interval_precision', 'udt_catalog', 'udt_schema',
        'udt_name', 'scope_catalog', 'scope_schema', 'scope_name',
        'maximum_cardinality', 'dtd_identifier', 'parameter_default',
    ],
    'information_schema_referential_constraints': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'unique_constraint_catalog', 'unique_constraint_schema',
        'unique_constraint_name', 'match_option', 'update_rule',
        'delete_rule',
    ],
    'information_schema_role_column_grants': [
        'grantor', 'grantee', 'table_catalog', 'table_schema',
        'table_name', 'column_name', 'privilege_type', 'is_grantable',
    ],
    'information_schema_role_routine_grants': [
        'grantor', 'grantee', 'specific_catalog', 'specific_schema',
        'specific_name', 'routine_catalog', 'routine_schema',
        'routine_name', 'privilege_type', 'is_grantable',
    ],
    'information_schema_role_table_grants': [
        'grantor', 'grantee', 'table_catalog', 'table_schema',
        'table_name', 'privilege_type', 'is_grantable', 'with_hierarchy',
    ],
    'information_schema_role_udt_grants': [
        'grantor', 'grantee', 'udt_catalog', 'udt_schema', 'udt_name',
        'privilege_type', 'is_grantable',
    ],
    'information_schema_role_usage_grants': [
        'grantor', 'grantee', 'object_catalog', 'object_schema',
        'object_name', 'object_type', 'privilege_type', 'is_grantable',
    ],
    'information_schema_routine_column_usage': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'routine_catalog', 'routine_schema', 'routine_name',
        'table_catalog', 'table_schema', 'table_name', 'column_name',
    ],
    'information_schema_routine_privileges': [
        'grantor', 'grantee', 'specific_catalog', 'specific_schema',
        'specific_name', 'routine_catalog', 'routine_schema',
        'routine_name', 'privilege_type', 'is_grantable',
    ],
    'information_schema_routine_routine_usage': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'routine_catalog', 'routine_schema', 'routine_name',
    ],
    'information_schema_routine_sequence_usage': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'routine_catalog', 'routine_schema', 'routine_name',
        'sequence_catalog', 'sequence_schema', 'sequence_name',
    ],
    'information_schema_routine_table_usage': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'routine_catalog', 'routine_schema', 'routine_name',
        'table_catalog', 'table_schema', 'table_name',
    ],
    'information_schema_routines': [
        'specific_catalog', 'specific_schema', 'specific_name',
        'routine_catalog', 'routine_schema', 'routine_name',
        'routine_type', 'module_catalog', 'module_schema', 'module_name',
        'udt_catalog', 'udt_schema', 'udt_name', 'data_type',
        'character_maximum_length', 'character_octet_length',
        'character_set_catalog', 'character_set_schema',
        'character_set_name', 'collation_catalog', 'collation_schema',
        'collation_name', 'numeric_precision', 'numeric_precision_radix',
        'numeric_scale', 'datetime_precision', 'interval_type',
        'interval_precision', 'type_udt_catalog', 'type_udt_schema',
        'type_udt_name', 'scope_catalog', 'scope_schema', 'scope_name',
        'maximum_cardinality', 'dtd_identifier', 'routine_body',
        'routine_definition', 'external_name', 'external_language',
        'parameter_style', 'is_deterministic', 'sql_data_access',
        'is_null_call', 'sql_path', 'schema_level_routine',
        'max_dynamic_result_sets', 'is_user_defined_cast',
        'is_implicitly_invocable', 'security_type',
        'to_sql_specific_catalog', 'to_sql_specific_schema',
        'to_sql_specific_name', 'as_locator', 'created', 'last_altered',
        'new_savepoint_level', 'is_udt_dependent',
        'result_cast_from_data_type', 'result_cast_as_locator',
        'result_cast_char_max_length', 'result_cast_char_octet_length',
        'result_cast_char_set_catalog', 'result_cast_char_set_schema',
        'result_cast_char_set_name', 'result_cast_collation_catalog',
        'result_cast_collation_schema', 'result_cast_collation_name',
        'result_cast_numeric_precision',
        'result_cast_numeric_precision_radix', 'result_cast_numeric_scale',
        'result_cast_datetime_precision', 'result_cast_interval_type',
        'result_cast_interval_precision', 'result_cast_type_udt_catalog',
        'result_cast_type_udt_schema', 'result_cast_type_udt_name',
        'result_cast_scope_catalog', 'result_cast_scope_schema',
        'result_cast_scope_name', 'result_cast_maximum_cardinality',
        'result_cast_dtd_identifier',
    ],
    'information_schema_schemata': [
        'catalog_name', 'schema_name', 'schema_owner',
        'default_character_set_catalog', 'default_character_set_schema',
        'default_character_set_name', 'sql_path',
    ],
    'information_schema_sequences': [
        'sequence_catalog', 'sequence_schema', 'sequence_name',
        'data_type', 'numeric_precision', 'numeric_precision_radix',
        'numeric_scale', 'start_value', 'minimum_value', 'maximum_value',
        'increment', 'cycle_option',
    ],
    'information_schema_sql_features': [
        'feature_id', 'feature_name', 'sub_feature_id', 'sub_feature_name',
        'is_supported', 'is_verified_by', 'comments',
    ],
    'information_schema_sql_implementation_info': [
        'implementation_info_id', 'implementation_info_name',
        'integer_value', 'character_value', 'comments',
    ],
    'information_schema_sql_parts': [
        'feature_id', 'feature_name', 'is_supported', 'is_verified_by',
        'comments',
    ],
    'information_schema_sql_sizing': [
        'sizing_id', 'sizing_name', 'supported_value', 'comments',
    ],
    'information_schema_table_constraints': [
        'constraint_catalog', 'constraint_schema', 'constraint_name',
        'table_catalog', 'table_schema', 'table_name', 'constraint_type',
        'is_deferrable', 'initially_deferred', 'enforced',
        'nulls_distinct',
    ],
    'information_schema_table_privileges': [
        'grantor', 'grantee', 'table_catalog', 'table_schema',
        'table_name', 'privilege_type', 'is_grantable', 'with_hierarchy',
    ],
    'information_schema_tables': [
        'table_catalog', 'table_schema', 'table_name', 'table_type',
        'self_referencing_column_name', 'reference_generation',
        'user_defined_type_catalog', 'user_defined_type_schema',
        'user_defined_type_name', 'is_insertable_into', 'is_typed',
        'commit_action',
    ],
    'information_schema_transforms': [
        'udt_catalog', 'udt_schema', 'udt_name', 'specific_catalog',
        'specific_schema', 'specific_name', 'group_name', 'transform_type',
    ],
    'information_schema_triggered_update_columns': [
        'trigger_catalog', 'trigger_schema', 'trigger_name',
        'event_object_catalog', 'event_object_schema',
        'event_object_table', 'event_object_column',
    ],
    'information_schema_triggers': [
        'trigger_catalog', 'trigger_schema', 'trigger_name',
        'event_manipulation', 'event_object_catalog',
        'event_object_schema', 'event_object_table', 'action_order',
        'action_condition', 'action_statement', 'action_orientation',
        'action_timing', 'action_reference_old_table',
        'action_reference_new_table', 'action_reference_old_row',
        'action_reference_new_row', 'created',
    ],
    'information_schema_udt_privileges': [
        'grantor', 'grantee', 'udt_catalog', 'udt_schema', 'udt_name',
        'privilege_type', 'is_grantable',
    ],
    'information_schema_usage_privileges': [
        'grantor', 'grantee', 'object_catalog', 'object_schema',
        'object_name', 'object_type', 'privilege_type', 'is_grantable',
    ],
    'information_schema_user_defined_types': [
        'user_defined_type_catalog', 'user_defined_type_schema',
        'user_defined_type_name', 'user_defined_type_category',
        'is_instantiable', 'is_final', 'ordering_form',
        'ordering_category', 'ordering_routine_catalog',
        'ordering_routine_schema', 'ordering_routine_name',
        'reference_type', 'data_type', 'character_maximum_length',
        'character_octet_length', 'character_set_catalog',
        'character_set_schema', 'character_set_name', 'collation_catalog',
        'collation_schema', 'collation_name', 'numeric_precision',
        'numeric_precision_radix', 'numeric_scale', 'datetime_precision',
        'interval_type', 'interval_precision', 'source_dtd_identifier',
        'ref_dtd_identifier',
    ],
    'information_schema_user_mapping_options': [
        'authorization_identifier', 'foreign_server_catalog',
        'foreign_server_name', 'option_name', 'option_value',
    ],
    'information_schema_user_mappings': [
        'authorization_identifier', 'foreign_server_catalog',
        'foreign_server_name',
    ],
    'information_schema_view_column_usage': [
        'view_catalog', 'view_schema', 'view_name', 'table_catalog',
        'table_schema', 'table_name', 'column_name',
    ],
    'information_schema_view_routine_usage': [
        'table_catalog', 'table_schema', 'table_name', 'specific_catalog',
        'specific_schema', 'specific_name',
    ],
    'information_schema_view_table_usage': [
        'view_catalog', 'view_schema', 'view_name', 'table_catalog',
        'table_schema', 'table_name',
    ],
    'information_schema_views': [
        'table_catalog', 'table_schema', 'table_name', 'view_definition',
        'check_option', 'is_updatable', 'is_insertable_into',
        'is_trigger_updatable', 'is_trigger_deletable',
        'is_trigger_insertable_into',
    ],
}


#: PG's standard session settings with their documented descriptions
#: (any/pg/system/pg_settings.test) — live values merge in at view
#: build time
PG_SETTINGS_ROWS = [
    ("application_name", "",
     "Sets the application name to be reported in statistics and logs."),
    ("bytea_output", "hex", "Sets the output format for bytea."),
    ("client_encoding", "UTF8",
     "Sets the client's character set encoding."),
    ("default_transaction_read_only", "off",
     "Sets the default read-only status of new transactions."),
    ("extra_float_digits", "1",
     "Sets the number of digits displayed for floating-point values."),
    ("in_hot_standby", "off",
     "Shows whether hot standby is currently active."),
    ("integer_datetimes", "on",
     "Shows whether datetimes are integer based."),
    ("scram_iterations", "4096",
     "Sets the iteration count for SCRAM secret generation."),
    ("server_encoding", "UTF8",
     "Shows the server (database) character set encoding."),
    ("server_version", "17.0", "Shows the server version."),
    ("standard_conforming_strings", "on",
     "Causes '...' strings to treat backslashes literally."),
]

#: per-name descriptions for the LIVE session variables
PG_SETTINGS_LIVE_DESC = {
    "search_path":
        "Sets the schema search order for names that are not "
        "schema-qualified.",
    "transaction_isolation":
        "Sets the current transaction's isolation level.",
    "default_transaction_isolation":
        "Sets the transaction isolation level of each new transaction.",
}


#: PG's built-in scalar types with their REAL catalog metadata
#: (oid, typname, typlen, typbyval, typcategory, typispreferred,
#: typarray) — pg_type rows render these verbatim
#: (any/pg/system/tables.test:320). Array twins derive below.
PG_BASE_TYPES = [
    (16, "bool", 1, True, "B", True, 1000),
    (17, "bytea", -1, False, "U", False, 1001),
    (20, "int8", 8, True, "N", False, 1016),
    (21, "int2", 2, True, "N", False, 1005),
    (23, "int4", 4, True, "N", False, 1007),
    (25, "text", -1, False, "S", True, 1009),
    (700, "float4", 4, True, "N", False, 1021),
    (701, "float8", 8, True, "N", True, 1022),
    (1042, "bpchar", -1, False, "S", False, 1014),
    (1043, "varchar", -1, False, "S", False, 1015),
    (1082, "date", 4, True, "D", False, 1182),
    (1114, "timestamp", 8, True, "D", False, 1115),
    (1700, "numeric", -1, False, "N", False, 1231),
]


def pg_type_rows() -> list[tuple]:
    """(oid, typname, typlen, typbyval, typtype, typcategory,
    typispreferred, typisdefined, typdelim, typrelid, typelem,
    typarray) for every built-in scalar + its array twin."""
    rows = []
    for oid, name, ln, byval, cat, pref, arr in PG_BASE_TYPES:
        rows.append((oid, name, ln, byval, "b", cat, pref, True,
                     ",", 0, 0, arr))
        rows.append((arr, "_" + name, -1, False, "b", "A", False, True,
                     ",", 0, oid, 0))
    rows.append((705, "unknown", -2, False, "p", "X", False, True,
                 ",", 0, 0, 0))
    return sorted(rows)


def pad_catalog_views(spark) -> None:
    """Re-register every known catalog temp view with PG's full column
    set: existing columns keep their live values; missing ones append as
    typed defaults, then the projection reorders to PG's order."""
    from pyspark.sql import functions as F

    for rel, want in {**FULL_COLUMNS, **IS_FULL_COLUMNS}.items():
        try:
            df = spark.table(rel)
        except Exception:
            # relation not yet materialized by any live builder: an
            # EMPTY relation with PG's full shape (pg_stat_progress_*)
            over = PAD_OVERRIDES.get(rel, {})
            ddl = ", ".join(
                f"{c} {over.get(c, ('string', None))[0]}"
                for c in want)
            spark.createDataFrame([], ddl).createOrReplaceTempView(rel)
            continue
        have = set(df.columns)
        if have == set(want) and df.columns == want:
            continue
        over = PAD_OVERRIDES.get(rel, {})
        cols = []
        for c in want:
            if c in have:
                cols.append(F.col(c))
            else:
                typ, lit = over.get(c, ("string", "NULL"))
                cols.append(F.expr(lit).cast(typ).alias(c))
        # strict projection: SELECT * must yield exactly PG's header
        # (check_columns.test compares LIMIT 0 headers verbatim)
        df.select(*cols).createOrReplaceTempView(rel)


#: the reference's fixed system-relation oid assignment
#: (sdb/pg/system/pg_class.test block 1) — (oid, relname, relkind);
#: '<slt:ignore>' oids are run-dependent VIEWS registered dynamically
SYSTEM_RELATIONS = [
    (101, 'pg_aggregate', 'r'),
    (102, 'pg_am', 'r'),
    (103, 'pg_amop', 'r'),
    (104, 'pg_amproc', 'r'),
    (105, 'pg_attrdef', 'r'),
    (106, 'pg_attribute', 'r'),
    (107, 'pg_authid', 'r'),
    (108, 'pg_auth_members', 'r'),
    (109, 'pg_cast', 'r'),
    (110, 'pg_class', 'r'),
    (111, 'pg_collation', 'r'),
    (112, 'pg_constraint', 'r'),
    (113, 'pg_conversion', 'r'),
    (114, 'pg_database', 'r'),
    (115, 'pg_db_role_setting', 'r'),
    (116, 'pg_default_acl', 'r'),
    (117, 'pg_depend', 'r'),
    (118, 'pg_description', 'r'),
    (119, 'pg_enum', 'r'),
    (120, 'pg_event_trigger', 'r'),
    (121, 'pg_extension', 'r'),
    (122, 'pg_foreign_data_wrapper', 'r'),
    (123, 'pg_foreign_server', 'r'),
    (124, 'pg_foreign_table', 'r'),
    (125, 'pg_index', 'r'),
    (126, 'pg_inherits', 'r'),
    (127, 'pg_init_privs', 'r'),
    (128, 'pg_language', 'r'),
    (129, 'pg_largeobject', 'r'),
    (130, 'pg_largeobject_metadata', 'r'),
    (131, 'pg_namespace', 'r'),
    (132, 'pg_opclass', 'r'),
    (133, 'pg_operator', 'r'),
    (134, 'pg_opfamily', 'r'),
    (135, 'pg_parameter_acl', 'r'),
    (136, 'pg_partitioned_table', 'r'),
    (137, 'pg_policy', 'r'),
    (138, 'pg_proc', 'r'),
    (139, 'pg_publication', 'r'),
    (140, 'pg_publication_namespace', 'r'),
    (141, 'pg_publication_rel', 'r'),
    (142, 'pg_range', 'r'),
    (143, 'pg_replication_origin', 'r'),
    (144, 'pg_rewrite', 'r'),
    (145, 'pg_seclabel', 'r'),
    (146, 'pg_sequence', 'r'),
    (147, 'pg_shdepend', 'r'),
    (148, 'pg_shdescription', 'r'),
    (149, 'pg_shseclabel', 'r'),
    (150, 'pg_statistic', 'r'),
    (151, 'pg_statistic_ext', 'r'),
    (152, 'pg_statistic_ext_data', 'r'),
    (153, 'pg_subscription', 'r'),
    (154, 'pg_subscription_rel', 'r'),
    (155, 'pg_tablespace', 'r'),
    (156, 'pg_transform', 'r'),
    (157, 'pg_trigger', 'r'),
    (158, 'pg_ts_config', 'r'),
    (159, 'pg_ts_config_map', 'r'),
    (160, 'pg_ts_dict', 'r'),
    (161, 'pg_ts_parser', 'r'),
    (162, 'pg_ts_template', 'r'),
    (163, 'pg_type', 'r'),
    (164, 'pg_user_mapping', 'r'),
    (165, 'sql_features', 'r'),
    (166, 'sql_implementation_info', 'r'),
    (167, 'sql_parts', 'r'),
    (168, 'sql_sizing', 'r'),
    (169, 'pg_hba_file_rules', 'v'),
    (999994, 'sdb_settings', 'r'),
    (999995, 'sdb_metrics', 'r'),
    (999997, 'sdb_progress', 'r'),
]

#: run-dependent-oid system views (same block, <slt:ignore> oids)
SYSTEM_RELATIONS_DYN = [
    (2000000 + 0, 'pg_roles', 'v'),
    (2000000 + 1, 'pg_shadow', 'v'),
    (2000000 + 2, 'pg_user', 'v'),
    (2000000 + 3, 'pg_rules', 'v'),
    (2000000 + 4, 'pg_views', 'v'),
    (2000000 + 5, 'pg_tables', 'v'),
    (2000000 + 6, 'pg_matviews', 'v'),
    (2000000 + 7, 'pg_indexes', 'v'),
    (2000000 + 8, 'pg_sequences', 'v'),
    (2000000 + 9, 'pg_stats', 'v'),
    (2000000 + 10, 'pg_locks', 'v'),
    (2000000 + 11, 'pg_cursors', 'v'),
    (2000000 + 12, 'pg_available_extensions', 'v'),
    (2000000 + 13, 'pg_available_extension_versions', 'v'),
    (2000000 + 14, 'pg_prepared_xacts', 'v'),
    (2000000 + 15, 'pg_prepared_statements', 'v'),
    (2000000 + 16, 'pg_seclabels', 'v'),
    (2000000 + 17, 'pg_settings', 'v'),
    (2000000 + 18, 'pg_file_settings', 'v'),
    (2000000 + 19, 'pg_ident_file_mappings', 'v'),
    (2000000 + 20, 'pg_timezone_abbrevs', 'v'),
    (2000000 + 21, 'pg_timezone_names', 'v'),
    (2000000 + 22, 'pg_config', 'v'),
    (2000000 + 23, 'pg_shmem_allocations', 'v'),
    (2000000 + 24, 'pg_shmem_allocations_numa', 'v'),
    (2000000 + 25, 'pg_backend_memory_contexts', 'v'),
    (2000000 + 26, 'pg_stat_all_tables', 'v'),
    (2000000 + 27, 'pg_stat_xact_all_tables', 'v'),
    (2000000 + 28, 'pg_stat_sys_tables', 'v'),
    (2000000 + 29, 'pg_stat_xact_sys_tables', 'v'),
    (2000000 + 30, 'pg_stat_user_tables', 'v'),
    (2000000 + 31, 'pg_stat_xact_user_tables', 'v'),
    (2000000 + 32, 'pg_statio_all_tables', 'v'),
    (2000000 + 33, 'pg_statio_sys_tables', 'v'),
    (2000000 + 34, 'pg_statio_user_tables', 'v'),
    (2000000 + 35, 'pg_stat_all_indexes', 'v'),
    (2000000 + 36, 'pg_stat_sys_indexes', 'v'),
    (2000000 + 37, 'pg_stat_user_indexes', 'v'),
    (2000000 + 38, 'pg_statio_all_indexes', 'v'),
    (2000000 + 39, 'pg_statio_sys_indexes', 'v'),
    (2000000 + 40, 'pg_statio_user_indexes', 'v'),
    (2000000 + 41, 'pg_statio_all_sequences', 'v'),
    (2000000 + 42, 'pg_statio_sys_sequences', 'v'),
    (2000000 + 43, 'pg_statio_user_sequences', 'v'),
    (2000000 + 44, 'pg_stat_activity', 'v'),
    (2000000 + 45, 'pg_stat_replication', 'v'),
    (2000000 + 46, 'pg_stat_slru', 'v'),
    (2000000 + 47, 'pg_stat_wal_receiver', 'v'),
    (2000000 + 48, 'pg_stat_recovery_prefetch', 'v'),
    (2000000 + 49, 'pg_stat_subscription', 'v'),
    (2000000 + 50, 'pg_stat_ssl', 'v'),
    (2000000 + 51, 'pg_stat_gssapi', 'v'),
    (2000000 + 52, 'pg_replication_slots', 'v'),
    (2000000 + 53, 'pg_stat_replication_slots', 'v'),
    (2000000 + 54, 'pg_stat_database', 'v'),
    (2000000 + 55, 'pg_stat_database_conflicts', 'v'),
    (2000000 + 56, 'pg_stat_user_functions', 'v'),
    (2000000 + 57, 'pg_stat_xact_user_functions', 'v'),
    (2000000 + 58, 'pg_stat_archiver', 'v'),
    (2000000 + 59, 'pg_stat_bgwriter', 'v'),
    (2000000 + 60, 'pg_stat_checkpointer', 'v'),
    (2000000 + 61, 'pg_stat_io', 'v'),
    (2000000 + 62, 'pg_stat_wal', 'v'),
    (2000000 + 63, 'pg_stat_progress_analyze', 'v'),
    (2000000 + 64, 'pg_stat_progress_vacuum', 'v'),
    (2000000 + 65, 'pg_stat_progress_cluster', 'v'),
    (2000000 + 66, 'pg_stat_progress_create_index', 'v'),
    (2000000 + 67, 'pg_stat_progress_basebackup', 'v'),
    (2000000 + 68, 'pg_stat_progress_copy', 'v'),
    (2000000 + 69, 'pg_user_mappings', 'v'),
    (2000000 + 70, 'pg_replication_origin_status', 'v'),
    (2000000 + 71, 'pg_stat_subscription_stats', 'v'),
    (2000000 + 72, 'pg_wait_events', 'v'),
    (2000000 + 73, 'pg_aios', 'v'),
    (2000000 + 74, 'information_schema_catalog_name', 'v'),
    (2000000 + 75, 'applicable_roles', 'v'),
    (2000000 + 76, 'administrable_role_authorizations', 'v'),
    (2000000 + 77, 'attributes', 'v'),
    (2000000 + 78, 'character_sets', 'v'),
    (2000000 + 79, 'check_constraint_routine_usage', 'v'),
    (2000000 + 80, 'check_constraints', 'v'),
    (2000000 + 81, 'collations', 'v'),
    (2000000 + 82, 'collation_character_set_applicability', 'v'),
    (2000000 + 83, 'column_column_usage', 'v'),
    (2000000 + 84, 'column_domain_usage', 'v'),
    (2000000 + 85, 'column_privileges', 'v'),
    (2000000 + 86, 'column_udt_usage', 'v'),
    (2000000 + 87, 'columns', 'v'),
    (2000000 + 88, 'constraint_column_usage', 'v'),
    (2000000 + 89, 'constraint_table_usage', 'v'),
    (2000000 + 90, 'domain_constraints', 'v'),
    (2000000 + 91, 'domain_udt_usage', 'v'),
    (2000000 + 92, 'domains', 'v'),
    (2000000 + 93, 'enabled_roles', 'v'),
    (2000000 + 94, 'parameters', 'v'),
    (2000000 + 95, 'referential_constraints', 'v'),
    (2000000 + 96, 'role_column_grants', 'v'),
    (2000000 + 97, 'routine_column_usage', 'v'),
    (2000000 + 98, 'routine_privileges', 'v'),
    (2000000 + 99, 'role_routine_grants', 'v'),
    (2000000 + 100, 'routine_routine_usage', 'v'),
    (2000000 + 101, 'routine_sequence_usage', 'v'),
    (2000000 + 102, 'routine_table_usage', 'v'),
    (2000000 + 103, 'routines', 'v'),
    (2000000 + 104, 'schemata', 'v'),
    (2000000 + 105, 'sequences', 'v'),
    (2000000 + 106, 'table_constraints', 'v'),
    (2000000 + 107, 'table_privileges', 'v'),
    (2000000 + 108, 'role_table_grants', 'v'),
    (2000000 + 109, 'tables', 'v'),
    (2000000 + 110, 'transforms', 'v'),
    (2000000 + 111, 'triggered_update_columns', 'v'),
    (2000000 + 112, 'triggers', 'v'),
    (2000000 + 113, 'udt_privileges', 'v'),
    (2000000 + 114, 'role_udt_grants', 'v'),
    (2000000 + 115, 'usage_privileges', 'v'),
    (2000000 + 116, 'role_usage_grants', 'v'),
    (2000000 + 117, 'user_defined_types', 'v'),
    (2000000 + 118, 'view_column_usage', 'v'),
    (2000000 + 119, 'view_routine_usage', 'v'),
    (2000000 + 120, 'view_table_usage', 'v'),
    (2000000 + 121, 'views', 'v'),
    (2000000 + 122, 'data_type_privileges', 'v'),
    (2000000 + 123, 'element_types', 'v'),
    (2000000 + 124, '_pg_foreign_table_columns', 'v'),
    (2000000 + 125, 'column_options', 'v'),
    (2000000 + 126, '_pg_foreign_data_wrappers', 'v'),
    (2000000 + 127, 'foreign_data_wrapper_options', 'v'),
    (2000000 + 128, 'foreign_data_wrappers', 'v'),
    (2000000 + 129, '_pg_foreign_servers', 'v'),
    (2000000 + 130, 'foreign_server_options', 'v'),
    (2000000 + 131, 'foreign_servers', 'v'),
    (2000000 + 132, '_pg_foreign_tables', 'v'),
    (2000000 + 133, 'foreign_table_options', 'v'),
    (2000000 + 134, 'foreign_tables', 'v'),
    (2000000 + 135, '_pg_user_mappings', 'v'),
    (2000000 + 136, 'user_mapping_options', 'v'),
    (2000000 + 137, 'user_mappings', 'v'),
]
