/*!40101 SET NAMES binary*/;
CREATE TABLE `people` (
  `id` bigint(20) NOT NULL AUTO_INCREMENT,
  `name` varchar(64) NOT NULL,
  `age` tinyint(4) DEFAULT NULL,
  `balance` decimal(12,2) NOT NULL DEFAULT '0.00',
  `ratio` double DEFAULT NULL,
  `status` enum('active','idle','banned') DEFAULT 'idle',
  `joined` datetime(6) DEFAULT NULL,
  `note` text,
  PRIMARY KEY (`id`),
  KEY `idx_name` (`name`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;
